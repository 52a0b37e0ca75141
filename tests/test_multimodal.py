"""Driver-side exactness check for the mapInPandas feature-extraction path.

`multimodal_features` has no SQL oracle (mapInPandas is not
SQL-expressible), so its correctness gate is this unit test: recompute
sha1 / byte_len / brightness in pure Python over the collected payloads
at sf0.001 and require exact equality.
"""

from __future__ import annotations

import hashlib

from lhbench_spark.catalog import table
from lhbench_spark.operators import multimodal
from tests.conftest import SMOKE_SF


def test_extract_features_matches_hashlib(spark):
    docs = table(spark, SMOKE_SF, "documents")
    media = multimodal.documents_as_media(docs)
    got = {
        r["media_id"]: r
        for r in multimodal.extract_features(media).collect()
    }

    expected_rows = media.select("media_id", "payload").collect()
    assert len(expected_rows) == len(got) > 0

    for row in expected_rows:
        payload = bytes(row["payload"])
        g = got[row["media_id"]]
        assert g["byte_len"] == len(payload)
        assert g["sha1"] == hashlib.sha1(payload).hexdigest()
        exp_brightness = (sum(payload) / len(payload) / 255.0) if payload else 0.0
        assert abs(g["brightness"] - exp_brightness) < 1e-12


def test_decode_image_is_declared_stub():
    """The decode step is an explicit NotImplementedError stub by design
    (no imaging libs in this container) — keep that contract visible."""
    import pytest

    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")
