"""select_training_corpus: each filter + the cluster-keeper step on a
planted corpus."""

import pyarrow as pa
import ray.data as rd

from dxa_pagerank_ray.pipelines.corpus import select_training_corpus

_EN = ("the cat sat of the mat and it is you that know it "
       "in the house and the dog is here that way you see")


def test_select_training_corpus_planted(ray_session):
    docs = [
        _EN + " alpha beta gamma delta epsilon zeta eta theta",   # 0: kept
        _EN + " alpha beta gamma delta epsilon zeta eta thetaX",  # 1: near-dup of 0
        "the cat is you",                                         # 2: too short
        "le chat est la et je ne pas une les der die das und",    # 3: not en
        _EN + " !!! ??? ;;; ### $$$ %%% &&& *** ((( ))) @@@ !!!"
        " ??? ;;; ### $$$ %%% &&& *** !!! ??? ;;; ###",           # 4: punct-heavy
        _EN + " totally different tail about ships and stars and"
        " maps and long roads through quiet plains tonight",      # 5: kept
    ]
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())})
    got = select_training_corpus(
        rd.from_arrow(t).repartition(3), num_docs=len(docs),
        langs=("en",), min_tokens=10, max_punct_ratio=0.15,
    )
    assert got["doc_id"].to_pylist() == [0, 5]
    assert got["lang_pred"].to_pylist() == ["en", "en"]

    # keeper_limit=0 forces the distributed tier (LabelCSR labels ->
    # partitioned parquet -> cogroup_attach keep-join); identical rows
    got_big = select_training_corpus(
        rd.from_arrow(t).repartition(3), num_docs=len(docs),
        langs=("en",), min_tokens=10, max_punct_ratio=0.15,
        keeper_limit=0,
    )
    assert got_big["doc_id"].to_pylist() == got["doc_id"].to_pylist()
    assert got_big["lang_pred"].to_pylist() == got["lang_pred"].to_pylist()
