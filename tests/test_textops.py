"""top_terms: corpus term-frequency top-k vs a plain Counter oracle."""

from collections import Counter

import pyarrow as pa
import ray.data as rd

from dxa_pagerank_ray.stages.textops import top_terms


def test_top_terms_matches_counter(ray_session):
    docs = [
        "The quick brown fox jumps over the lazy dog",
        "the dog sleeps; the fox runs! A dog_barks",
        "",
        None,
        "Fox fox FOX, dog",
    ]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    got = top_terms(rd.from_arrow(t).repartition(3), k=4)
    import re

    cnt = Counter(
        tok for d in docs
        for tok in re.split(r"\W+", (d or "").lower()) if tok
    )
    # note: "dog_barks" stays one token (underscore is \w)
    exp = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    assert list(zip(got["term"].to_pylist(), got["n"].to_pylist())) == exp


def test_top_terms_ties_and_k_boundary(ray_session):
    # all terms distinct once -> pure alphabetical cut at the k boundary
    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array(["d c b a e"], pa.string())})
    got = top_terms(rd.from_arrow(t), k=3)
    assert got["term"].to_pylist() == ["a", "b", "c"]
    assert got["n"].to_pylist() == [1, 1, 1]
