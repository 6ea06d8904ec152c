"""SemDeDup: known-answer drops, partition-independence (the
bit-identity contract of the shared exact kernels), and the
cluster-width cap."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from dxa_pagerank_ray.stages.semdedup import (
    _segment_drops,
    assign_clusters,
    semantic_dedup_keepers,
)


def _vecs_table(vecs, ids=None):
    vecs = np.asarray(vecs, dtype=np.float32)
    n = len(vecs)
    ids = np.arange(n, dtype=np.int64) if ids is None else np.asarray(ids)
    flat = pa.array(vecs.ravel(), pa.float32())
    offs = pa.array(np.arange(n + 1) * vecs.shape[1], pa.int32())
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.ListArray.from_arrays(offs, flat),
    })


def test_known_drops_with_explicit_centroids(ray_session):
    # one-hot vectors -> exact dot products, real ties impossible to
    # fake with BLAS rounding (memory: BLAS matmul is row-position-
    # dependent; the exact kernel is not)
    e = np.eye(4)
    vecs = [e[0], e[0], e[1], e[1] * 0.5 + e[2] * 0.5, e[3]]
    ds = rd.from_arrow(_vecs_table(vecs)).repartition(3)
    cents = np.eye(4)  # cluster c = axis c
    kept = semantic_dedup_keepers(ds, centroids=cents, threshold=0.9) \
        .to_pandas().sort_values("vec_id").reset_index(drop=True)
    # id1 is a verbatim dup of id0 (same cluster 0) -> dropped;
    # id3 lands in cluster 1 with id2 but cos = 1/sqrt(2) < 0.9 -> kept
    assert kept["vec_id"].tolist() == [0, 2, 3, 4]
    assert kept.set_index("vec_id")["cluster"].to_dict() == {
        0: 0, 2: 1, 3: 1, 4: 3}


def test_assign_clusters_ties_break_low(ray_session):
    v = np.array([[1.0, 1.0, 0.0]])  # equidistant from axes 0 and 1
    ds = rd.from_arrow(_vecs_table(v))
    got = assign_clusters(ds, np.eye(3)).to_pandas()
    assert got["cluster"].tolist() == [0]


def test_partition_independence_sf001(ray_session):
    emb = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    outs = []
    for nblocks in (1, 7):
        ds = emb.repartition(nblocks)
        t = semantic_dedup_keepers(ds, threshold=0.4) \
            .to_pandas().sort_values("vec_id").reset_index(drop=True)
        outs.append(t)
    assert outs[0].equals(outs[1])
    assert 0 < len(outs[0]) <= emb.count()


def test_cluster_cap_keeps_overflow():
    # 4 identical unit rows, cap 2: only the first 2 (by id) are swept
    # (id1 dropped by id0); ids 2,3 beyond the cap pass through kept
    v = np.tile(np.array([[1.0, 0.0]]), (4, 1))
    ids = np.arange(4, dtype=np.int64)
    drop = _segment_drops(ids, v, threshold=0.9, max_cluster=2)
    assert drop.tolist() == [False, True, False, False]


def test_matches_sequential_reference(ray_session):
    import pyarrow.parquet as pq

    from dxa_pagerank_ray.oracles.ann_reference import (
        embedding_clusters_reference,
        semantic_dedup_reference,
    )

    t = pq.read_table("/root/testdata/sf0.001/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ds = rd.from_arrow(t).repartition(5)

    from dxa_pagerank_ray.stages.ann import train_ivf_centroids

    got_cl = assign_clusters(ds, train_ivf_centroids(ds)).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    exp_cl = embedding_clusters_reference(t).to_pandas()
    assert got_cl.equals(exp_cl)

    got_k = semantic_dedup_keepers(ds, threshold=0.4).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    exp_k = semantic_dedup_reference(t, threshold=0.4).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert got_k.equals(exp_k)
