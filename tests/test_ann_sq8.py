"""E70 semantic guarantees: the SQ8+rerank index must (a) actually
quantize — ADC scores differ from exact cosine on every emitted row —
and (b) lose nothing at fixture scale: the SQ8_RERANK_R shortlist
absorbs the int8 ranking error, so the reranked top-K equals the exact
IVF top-K (same lists, same probes, full-precision final ordering).
(b) is the acceptance bar production sets for a compressed index before
swapping it in; at larger scales it is re-checked via ml_ann_recall's
methodology on a sample."""

from __future__ import annotations


def test_sq8_rerank_matches_exact_ivf(prepared_spark):
    from collector_spark.ml.similarity import ivf_sq8_topk, ivf_topk

    sq8 = ivf_sq8_topk(prepared_spark).collect()
    assert all(r.adc_cos != r.cosine for r in sq8), (
        "quantization inactive: ADC == exact on some row"
    )
    exact = {
        (r.query_id, r.corpus_id, r.rank)
        for r in ivf_topk(prepared_spark).collect()
    }
    got = {(r.query_id, r.corpus_id, r.rank) for r in sq8}
    assert got == exact
