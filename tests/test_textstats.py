

import numpy as np


def test_group_top_terms_tfidf_and_ties(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from dedup_ray.stages.textstats import group_top_terms

    t = pa.table({
        "g": pa.array(["a", "a", "b", "b"]),
        "text": pa.array([
            "x x x common", "y common", "z z common", "w common",
        ]),
    })
    out = group_top_terms(rd.from_arrow(t).repartition(2), "g", "text",
                          k=2, n_groups=2,
                          num_partitions=3).to_pandas()
    # 'common' appears in both groups -> df=2 -> score tf*ln(1)=0,
    # so the exclusive tokens win
    a = out[out.g == "a"].set_index("token")
    assert list(a.index) == ["x", "y"]
    assert a.loc["x", "tf"] == 3
    assert abs(a.loc["x", "score"] - 3 * np.log(2.0)) < 1e-6
    b = out[out.g == "b"].set_index("token")
    assert list(b.index) == ["z", "w"]  # score desc: z(tf2) then w(tf1)
    # n_groups=None path computes the census itself
    out2 = group_top_terms(rd.from_arrow(t).repartition(2), "g", "text",
                           k=2, num_partitions=2).to_pandas()
    assert sorted(out2.columns) == ["g", "score", "tf", "token"]
    assert len(out2) == 4
