"""Golden check for the multimodal decode stage: the mapInPandas plumbing
must produce byte-exact statistics for payloads recomputed in pure Python."""

from __future__ import annotations

import hashlib


def _expected(text: str) -> tuple[int, int]:
    payload = b"".join(
        hashlib.md5((text + suffix).encode()).digest() for suffix in ("", "a", "b", "c")
    )
    return len(payload), sum(payload)


def test_decode_features_matches_python(prepared_spark):
    from collector_spark.ml.multimodal import decode_features

    docs = {
        r["doc_id"]: r["text"]
        for r in prepared_spark.table("documents").limit(50).collect()
    }
    rows = {
        r["doc_id"]: r
        for r in decode_features(prepared_spark).filter(
            f"doc_id IN ({','.join(str(d) for d in docs)})"
        ).collect()
    }
    assert len(rows) == len(docs)
    for doc_id, text in docs.items():
        n, total = _expected(text)
        r = rows[doc_id]
        assert r["n_bytes"] == n
        assert r["byte_sum"] == total
        assert abs(r["mean_byte"] - total / n) < 1e-12
        assert r["decoder"] == "bytestats-fake"
