"""Product-quantization operator: encode invariants + ADC plan shape.

Value-level correctness is covered by the oracle parity sweep
(`ann_pq_code_histogram`, `ann_pq_topk` in tests/test_oracle_parity.py);
these tests pin the operator contract and the scale-critical plan shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from clickhouse_github_log_importer_spark.operators import similarity as SIM
from clickhouse_github_log_importer_spark.plans.queries import t

SF = "/root/testdata/sf0.001"


def _codebook(spark):
    emb = t(spark, SF, "embeddings")
    return SIM.ivf_codebook(emb, n_lists=16)


def test_pq_encode_invariants(spark):
    emb = t(spark, SF, "embeddings")
    cb = _codebook(spark)
    subcb = SIM.pq_subcodebooks(cb, SIM.PQ_M)
    rows = SIM.pq_encode(emb, cb).collect()
    assert len(rows) == emb.count()  # nonzero-norm corpus, none dropped
    cnorms = [[sum(c * c for c in cw) for cw in cbj] for cbj in subcb]
    for r in rows:
        codes = list(r["codes"])
        assert len(codes) == SIM.PQ_M
        assert all(0 <= c < SIM.PQ_K for c in codes)
        # recon_norm2 is exactly the sum of the chosen codewords' norms
        assert r["recon_norm2"] == sum(
            cnorms[j][codes[j]] for j in range(SIM.PQ_M)
        )


def test_pq_encode_matches_exact_argmin(spark):
    # spot-check the Arrow argmin against a driver-side exact recompute
    emb = t(spark, SF, "embeddings")
    cb = _codebook(spark)
    subcb = SIM.pq_subcodebooks(cb, SIM.PQ_M)
    dsub = len(subcb[0][0])
    qn = SIM.with_quantized_norm(emb).filter(F.col("vec_id") < 20).collect()
    enc = {
        r["vec_id"]: list(r["codes"])
        for r in SIM.pq_encode(emb.filter(F.col("vec_id") < 20), cb).collect()
    }
    for r in qn:
        q = list(r["q"])
        for j in range(SIM.PQ_M):
            sub = q[j * dsub : (j + 1) * dsub]
            dists = [
                sum((a - b) ** 2 for a, b in zip(sub, cw)) for cw in subcb[j]
            ]
            assert enc[r["vec_id"]][j] == dists.index(min(dists))


def test_pq_adc_plan_is_join_free(spark, sf_smoke):
    # the 100 TB contract: ADC scoring is one narrow scan over the code
    # table (query LUTs are literals) — no join anywhere in the plan;
    # the only exchange is the per-query top-k window
    from tests.test_plans import explain, tree

    p = tree(explain(spark, "ann_pq_topk", sf_smoke))
    assert "Join" not in p
    assert p.count("Exchange") <= 2  # topk window (+AQE coalesce shadow)


def test_pq_encode_deterministic(spark):
    emb = t(spark, SF, "embeddings")
    cb = _codebook(spark)

    def once():
        return sorted(
            (r["vec_id"], tuple(r["codes"]), r["recon_norm2"])
            for r in SIM.pq_encode(emb, cb).collect()
        )

    assert once() == once()


def test_ivfpq_nprobe_all_equals_full_adc(spark):
    # with nprobe = n_lists the IVF restriction vanishes: IVFPQ must
    # reproduce the full ADC scan's results exactly (same candidate set,
    # same integer LUT math, same tie-breaks)
    emb = t(spark, SF, "embeddings")
    cb = _codebook(spark)
    queries = emb.filter(F.col("vec_id") < 4)
    full = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["adc_sim"])
        for r in SIM.pq_adc_topk(emb, queries, cb, k=3).collect()
    )
    ivfpq = sorted(
        (r["query_id"], r["rank"], r["neighbor_id"], r["adc_sim"])
        for r in SIM.ivfpq_topk(emb, queries, cb, k=3, nprobe=16).collect()
    )
    assert full == ivfpq
