"""hash_sample / hash_split: reproducibility and partition independence."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from dxa_pagerank_ray.stages.sampling import hash_sample, hash_split, sample_hash


def _ids(ds):
    return sorted(
        i for b in ds.iter_batches(batch_format="pyarrow", batch_size=None)
        for i in b["doc_id"].to_pylist()
    )


def test_hash_sample_partition_independent(ray_session):
    t = pa.table({"doc_id": pa.array(range(2000), pa.int64())})
    a = _ids(hash_sample(rd.from_arrow(t).repartition(2), 0.3, seed=5))
    b = _ids(hash_sample(rd.from_arrow(t).repartition(13), 0.3, seed=5))
    assert a == b
    # matches the driver-side formula exactly
    ids = np.arange(2000, dtype=np.int64)
    exp = ids[sample_hash(ids, 5) < np.uint64(int(0.3 * (1 << 64)))]
    assert a == exp.tolist()
    # roughly the requested fraction
    assert 0.2 < len(a) / 2000 < 0.4


def test_hash_split_disjoint_exhaustive(ray_session):
    t = pa.table({"doc_id": pa.array(range(1000), pa.int64())})
    out = pa.concat_tables(
        b for b in hash_split(rd.from_arrow(t).repartition(3), 0.2, seed=9)
        .iter_batches(batch_format="pyarrow", batch_size=None)
    )
    assert out.num_rows == 1000
    splits = dict(zip(out["doc_id"].to_pylist(), out["split"].to_pylist()))
    hold = {k for k, v in splits.items() if v == "holdout"}
    # holdout == the docs hash_sample(0.2, seed=9) would keep
    kept = set(_ids(hash_sample(rd.from_arrow(t), 0.2, seed=9)))
    assert hold == kept


def test_hash_sample_fraction_edges(ray_session):
    t = pa.table({"doc_id": pa.array(range(100), pa.int64())})
    assert _ids(hash_sample(rd.from_arrow(t), 0.0)) == []
    assert _ids(hash_sample(rd.from_arrow(t), 1.0)) == list(range(100))


def test_stratified_sample_partition_independent(ray_session):
    import ray.data as rd

    from dxa_pagerank_ray.stages.sampling import stratified_sample

    docs = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                           columns=["doc_id", "source"])
    outs = []
    for nblocks in (1, 6):
        got = stratified_sample(docs.repartition(nblocks), k=3, seed=5) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        outs.append(got)
    assert outs[0].equals(outs[1])
    sizes = outs[0].groupby("source").size()
    assert (sizes <= 3).all() and len(outs[0]) > 0
    # exhaustive per group when the group has >= k members
    full = docs.to_pandas().groupby("source").size()
    for src_name, n in full.items():
        assert sizes.get(src_name, 0) == min(3, n)


def test_shard_assign_deterministic_and_uniform(ray_session):
    from dxa_pagerank_ray.stages.sampling import shard_assign

    t = pa.table({"doc_id": pa.array(range(4000), pa.int64())})

    def run(parts):
        df = shard_assign(rd.from_arrow(t).repartition(parts), 16,
                          seed=13).to_pandas()
        return df.sort_values("doc_id")["shard"].tolist()

    a, b = run(3), run(11)
    assert a == b
    # matches the driver formula exactly
    ids = np.arange(4000, dtype=np.int64)
    exp = (sample_hash(ids, 13) % np.uint64(16)).astype(np.int64)
    assert a == exp.tolist()
    # uniform-ish: every shard populated, none > 2x the mean
    counts = np.bincount(exp, minlength=16)
    assert counts.min() > 0 and counts.max() < 2 * 4000 / 16


def test_write_corpus_shards_roundtrip(ray_session, tmp_path):
    import json

    from dxa_pagerank_ray.stages.sampling import write_corpus_shards

    t = pa.table({"doc_id": pa.array(range(300), pa.int64()),
                  "n_chars": pa.array(range(300), pa.int64())})
    out = str(tmp_path / "shards")
    write_corpus_shards(rd.from_arrow(t), out, num_shards=8, seed=2)
    meta = json.load(open(f"{out}/_shards_meta.json"))
    assert meta == {"num_shards": 8, "seed": 2, "id_col": "doc_id"}
    back = rd.read_parquet(out).to_pandas()
    assert len(back) == 300
    # shard dirs exist and shard column matches the driver formula
    ids = back.sort_values("doc_id")["doc_id"].to_numpy()
    shards = back.sort_values("doc_id")["shard"].to_numpy().astype(np.int64)
    exp = (sample_hash(np.arange(300, dtype=np.int64), 2)
           % np.uint64(8)).astype(np.int64)
    assert (ids == np.arange(300)).all() and (shards == exp).all()
