"""ANN quality: multi-table hyperplane LSH vs the exact brute-force
baseline on the driver's embeddings table (500 × dim-64 vectors)."""

import pytest


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )


def _topk_sets(rows):
    out = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


@pytest.fixture(scope="module")
def clustered(spark):
    """Planted-cluster corpus: 50 centroids x 10 members, dim 64 — the
    structure real embedding corpora have (the driver's embeddings table is
    isotropic noise, where ANY sub-quadratic ANN is information-
    theoretically capped; see lsh_topk docstring)."""
    import numpy as np

    rng = np.random.default_rng(42)
    cents = rng.standard_normal((50, 64))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in cents:
        for _ in range(10):
            # per-vector noise NORM ~0.2 (0.025 per component x sqrt(64)),
            # i.e. same-cluster cosine ~0.96 — tight clusters
            v = c + 0.025 * rng.standard_normal(64)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_lsh_topk_recall_vs_exact(spark, clustered):
    """OR-amplified LSH (4 tables x 2^6 buckets) must reach recall >= 0.9
    against exact top-5 on clustered data, at a candidate budget
    ~n_tables*N*avg_bucket — two orders below the N^2 brute force."""
    from yckg_spark.operators.similarity import brute_force_topk, lsh_topk

    k = 5
    exact = _topk_sets(brute_force_topk(clustered, clustered, k=k).collect())
    approx = _topk_sets(
        lsh_topk(clustered, dim=64, k=k, n_planes=6, n_tables=4).collect()
    )
    hit = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    recall = hit / total
    assert recall >= 0.9, f"recall {recall:.3f}"


def test_embedding_neardup_lsh_composition(spark, clustered):
    """The corpus-scale near-dup composition: lsh_candidate_pairs ->
    embedding_neardup_pairs(candidates=...). Every emitted pair must carry
    the exact brute-force cosine (the verifier is exact), and on clustered
    data the candidate stage must retain recall >= 0.9 of the true
    same-cluster pairs (cosine ~0.96 => per-table collision ~0.57, OR'd
    over 4 tables ~0.97)."""
    from yckg_spark.operators.dedup import embedding_neardup_pairs
    from yckg_spark.operators.similarity import lsh_candidate_pairs

    thr = 0.9
    brute = {
        (r["id_a"], r["id_b"]): round(r["cosine"], 9)
        for r in embedding_neardup_pairs(clustered, threshold=thr).collect()
    }
    cand = lsh_candidate_pairs(clustered, dim=64, n_planes=6, n_tables=4)
    composed = {
        (r["id_a"], r["id_b"]): round(r["cosine"], 9)
        for r in embedding_neardup_pairs(
            clustered, threshold=thr, candidates=cand
        ).collect()
    }
    # exactness: a subset of brute force with identical scores
    assert set(composed) <= set(brute)
    assert all(brute[p] == c for p, c in composed.items())
    assert len(composed) / len(brute) >= 0.9

    # orientation contract: reversed candidate pairs give the same output
    rev = cand.selectExpr("id_b AS id_a", "id_a AS id_b")
    composed_rev = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(
            clustered, threshold=thr, candidates=rev
        ).collect()
    }
    assert composed_rev == set(composed)


def test_lsh_single_table_is_weaker_than_multi(spark, emb):
    """The round-1 single-table shape is strictly dominated: adding tables
    can only add candidates, so multi-table recall >= single-table."""
    from yckg_spark.operators.similarity import brute_force_topk, lsh_topk

    k = 5
    exact = _topk_sets(brute_force_topk(emb, emb, k=k).collect())
    one = _topk_sets(lsh_topk(emb, dim=64, k=k, n_planes=6, n_tables=1).collect())
    four = _topk_sets(lsh_topk(emb, dim=64, k=k, n_planes=6, n_tables=4).collect())

    def recall(ap):
        return sum(len(exact[q] & ap.get(q, set())) for q in exact) / sum(
            len(v) for v in exact.values()
        )

    assert recall(four) >= recall(one)


def test_lsh_max_bucket_cap_is_deterministic(spark, emb):
    from yckg_spark.operators.similarity import lsh_topk

    a = sorted(
        tuple(r)
        for r in lsh_topk(emb, dim=64, k=3, n_planes=4, n_tables=2, max_bucket=32).collect()
    )
    b = sorted(
        tuple(r)
        for r in lsh_topk(emb, dim=64, k=3, n_planes=4, n_tables=2, max_bucket=32).collect()
    )
    assert a == b and len(a) > 0


def test_ivf_full_probe_equals_brute_force(spark, emb):
    """nprobe == n_cells scores every pair exactly once -> identical to the
    exact baseline (the IVF machinery — training, assignment, probe join,
    rerank — introduces zero error when nothing is pruned)."""
    from yckg_spark.operators.similarity import brute_force_topk, ivf_topk

    qs = emb.filter("vec_id < 30")
    exact = sorted(
        (r["query_id"], r["neighbor_id"], round(r["cosine"], 9), r["rank"])
        for r in brute_force_topk(emb, qs, k=4).collect()
    )
    ivf = sorted(
        (r["query_id"], r["neighbor_id"], round(r["cosine"], 9), r["rank"])
        for r in ivf_topk(emb, qs, k=4, n_cells=8, nprobe=8).collect()
    )
    assert ivf == exact


def test_ivf_recall_on_clustered(spark, clustered):
    """Pruned probe (nprobe 4 of 32 cells -> ~1/8 of rerank work) keeps
    recall >= 0.9 on planted-cluster data — neighbors share a cell."""
    from yckg_spark.operators.similarity import brute_force_topk, ivf_topk

    k = 5
    exact = _topk_sets(brute_force_topk(clustered, clustered, k=k).collect())
    approx = _topk_sets(
        ivf_topk(clustered, clustered, k=k, n_cells=32, nprobe=4).collect()
    )
    hit = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    recall = hit / sum(len(v) for v in exact.values())
    assert recall >= 0.9, f"recall {recall:.3f}"


def test_ivf_deterministic(spark, emb):
    from yckg_spark.operators.similarity import ivf_topk

    qs = emb.filter("vec_id < 10")
    a = sorted(tuple(r) for r in ivf_topk(emb, qs, k=3, n_cells=8, nprobe=2).collect())
    b = sorted(tuple(r) for r in ivf_topk(emb, qs, k=3, n_cells=8, nprobe=2).collect())
    assert a == b and len(a) > 0


def test_ivf_stored_index_matches_in_memory(spark, emb, tmp_path):
    """Write index -> read back -> full-probe query == brute force, and the
    codebook round-trips so stored results match the in-memory path."""
    from yckg_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk_stored,
        ivf_write_index,
    )

    path = str(tmp_path / "ivf_index")
    ivf_write_index(emb, path, n_cells=8)
    qs = emb.filter("vec_id < 30")
    exact = sorted(
        (r["query_id"], r["neighbor_id"], round(r["cosine"], 9), r["rank"])
        for r in brute_force_topk(emb, qs, k=4).collect()
    )
    stored = sorted(
        (r["query_id"], r["neighbor_id"], round(r["cosine"], 9), r["rank"])
        for r in ivf_topk_stored(spark, path, qs, k=4, nprobe=8).collect()
    )
    assert stored == exact


def test_ivf_stored_probe_prunes_cell_partitions(spark, clustered, tmp_path):
    """A pruned probe against the stored index must reach the scan as a
    PartitionFilters entry on `cell` — directory-level pruning, the whole
    point of partitionBy(cell) — and read strictly fewer than all cells."""
    from yckg_spark.operators.similarity import ivf_topk_stored, ivf_write_index

    path = str(tmp_path / "ivf_index")
    ivf_write_index(clustered, path, n_cells=16)
    qs = clustered.filter("vec_id < 5")
    out = ivf_topk_stored(spark, path, qs, k=3, nprobe=2)
    assert out.count() > 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    seg = plan.split("PartitionFilters")[1][:300]
    assert "cell" in seg, seg
