"""Reference-formula conformance: normalizers, pair features, labels, bags.

Each operator's distributed output is compared against a literal pandas/
python re-implementation of the reference formulas (oracle), on the F2
fixture — the SURVEY.md §5 test plan.
"""

import itertools as it
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from dedup_ray.conformance.cluster import (
    all_in_one,
    chain_glue_components,
    kruskal_likelihood_block,
)
from dedup_ray.conformance.features import (
    diff_year_pairs,
    idf_dict,
    pair_feature_columns,
    pair_labels,
    tokens_of,
)
from dedup_ray.conformance.normalize import normalize_array
from dedup_ray.conformance.pubs import make_pubs
from dedup_ray.ops.relational import block_pairs, group_collect


def test_normalizer_exact_chain():
    raw = pa.array(
        [
            "Intl. Conf. on Data, 2017 (3rd)",
            "Data: Mining & 'Learning' 1999",
            "  leading blanks   and   runs",
            "4th/12th-test.",
        ]
    )
    import re

    def oracle(s):
        s = re.sub(r"[0-9]{4}|'|[0-9]+th|[0-9]+nd|[0-9]+st|[0-9]+rd|\.", "", s)
        s = re.sub(r",|/|'|\"|-|:|\(|\)", " ", s)
        s = re.sub(r"[ \t]{2,}", " ", s)
        s = re.sub(r"^[ \t]+", "", s)
        return s

    got = normalize_array(raw).to_pylist()
    assert got == [oracle(s) for s in raw.to_pylist()]


def test_canonical_pair_order():
    pubs, _ = make_pubs()
    ds = rd.from_arrow(pubs.select(["name", "id", "year"]))
    pairs = block_pairs(ds, "name", "id").to_pandas()
    for name, g in pairs.groupby("name"):
        ids = sorted(set(g["id1"]) | set(g["id2"]))
        want = list(it.combinations(ids, 2))
        got = sorted(zip(g["id1"], g["id2"]))
        assert got == sorted(want)
        assert (g["id1"] < g["id2"]).all()


def test_c_field_features_match_reference_formulas():
    pubs, _ = make_pubs()
    df = pubs.select(["name", "id", "title"]).to_pandas()
    # oracle IDF over the whole corpus (IDF.py semantics)
    tok_lists = [tokens_of(v, i) for v, i in zip(df["title"], df["id"])]
    zd = idf_dict(tok_lists)
    out = (
        pair_feature_columns(
            rd.from_pandas(df), "name", "id", "title", zd, prefix="title"
        )
        .to_pandas()
        .set_index(["name", "id1", "id2"])
        .sort_index()
    )
    # literal c_org.py oracle
    for name, g in df.groupby("name"):
        g = g.drop_duplicates(subset=["id"]).sort_values("id")
        toks = {i: tokens_of(v, i) for v, i in zip(g["title"], g["id"])}
        for a, b in it.combinations(sorted(toks), 2):
            al, bl = toks[a], toks[b]
            common = Counter(al) & Counter(bl)
            overlap = sum(common.values())
            sumlength = len(al) + len(bl)
            tf = 1 / float(len(al) * len(bl))
            if not common:
                idf = 0.0
            else:
                lu = np.array([zd[k] for k in common.keys()])
                idf = float(
                    np.log(lu * np.array(list(common.values())) + 1).sum()
                )
            row = out.loc[(name, a, b)]
            assert row["title_overlap"] == np.float32(overlap)
            assert row["title_share_dummy"] == (overlap != 0)
            assert np.isclose(
                row["title_jaccard_similarity_metric"],
                np.float32(overlap) / np.float32(sumlength - overlap),
            )
            assert np.isclose(row["title_logIDF"], np.float32(idf), rtol=1e-6)
            assert np.isclose(
                row["title_logTFIDF"],
                np.float32(idf) * np.float32(tf),
                rtol=1e-6,
            )


def test_diff_year_matches_reference():
    pubs, _ = make_pubs()
    df = pubs.select(["name", "id", "year"]).to_pandas()
    out = (
        diff_year_pairs(rd.from_pandas(df), "name", "id")
        .to_pandas()
        .set_index(["name", "id1", "id2"])
    )
    for name, g in df.groupby("name"):
        span = g["year"].max() - g["year"].min()
        cau = g[["id", "year"]].drop_duplicates().sort_values("id")
        for (a, ya), (b, yb) in it.combinations(
            cau.itertuples(index=False), 2
        ):
            want = np.float32(abs(ya - yb)) / np.float32(span)
            assert np.isclose(out.loc[(name, a, b)]["diff_year"], want)


def test_pair_labels_gap_fill_and_multi_assignment():
    pubs, assignment = make_pubs()
    adf = assignment.to_pandas()
    df = pubs.select(["name", "id"]).to_pandas()
    out = (
        pair_labels(rd.from_pandas(df), adf)
        .to_pandas()
        .set_index(["name", "id1", "id2"])
    )
    # literal label.py oracle
    for name, g in df.groupby("name"):
        d = adf[adf["name"] == name][["id", "cluster_seq"]].rename(
            columns={"cluster_seq": "seq"}
        )
        rid = np.setdiff1d(g["id"].unique(), d["id"].values)
        sq = list(range(d["seq"].max() + 1, d["seq"].max() + len(rid) + 1))
        d = pd.concat([d, pd.DataFrame({"id": rid, "seq": sq})])
        for (a, al), (b, bl) in it.combinations(d.groupby("id")["seq"], 2):
            want = float(
                (al.values[0] == bl.values[0])
                or (np.intersect1d(al.values, bl.values).size > 0)
            )
            assert out.loc[(name, a, b)]["label"] == np.float32(want)
    # the multi-assigned id must be positive toward members of both clusters
    multi_id = adf.iloc[0]["id"]
    sub = out.reset_index()
    pos = sub[
        ((sub["id1"] == multi_id) | (sub["id2"] == multi_id)) & (sub["label"] == 1)
    ]
    clusters_hit = set(
        adf[adf["id"].isin(set(pos["id1"]) | set(pos["id2"]))]["cluster_seq"]
    )
    assert {0, 1} <= clusters_hit


def test_bag_clustering_is_exact_key_groupby():
    pubs, _ = make_pubs()
    ds = rd.from_arrow(pubs.select(["name", "id", "venue"]))
    out = group_collect(ds, "venue", "id").to_pandas()
    df = pubs.select(["name", "id", "venue"]).to_pandas()
    want = df.groupby("venue")["id"].apply(lambda s: sorted(s)).to_dict()
    got = out.groupby("venue")["id"].apply(lambda s: sorted(s)).to_dict()
    assert got == want
    # rep = min member
    for venue, g in out.groupby("venue"):
        assert (g["cluster_rep"] == min(want[venue])).all()


def test_all_in_one_baseline():
    pubs, _ = make_pubs()
    out = all_in_one(rd.from_arrow(pubs.select(["name", "id"]))).to_pandas()
    assert out.groupby("name")["cluster_rep"].nunique().eq(1).all()


def test_chain_glue_matches_bruteforce_cc():
    df = pd.DataFrame(
        {
            "name": ["n"] * 6,
            "id": list("abcdef"),
            "venue": ["v1", "v1", "v2", "v2", "v3", ""],
            "org": ["", "o1", "o1", "", "", ""],
        }
    )
    out = chain_glue_components(
        rd.from_pandas(df), "name", "id", ["venue", "org"]
    ).to_pandas()
    reps = out.set_index("id")["cluster_rep"].to_dict()
    # a-b share v1; b-c share o1; c-d share v2 => {a,b,c,d}; e alone; f alone
    assert reps["a"] == reps["b"] == reps["c"] == reps["d"] == "a"
    assert reps["e"] == "e" and reps["f"] == "f"


def test_kruskal_likelihood_single_linkage():
    # two tight cliques (sim .9) with a weak cross edge (sim .1):
    # likelihood cut must keep them separate
    rows = []
    for grp, members in (("x", list("abc")), ("y", list("def"))):
        for a, b in it.combinations(members, 2):
            rows.append({"id1": a, "id2": b, "sim": 0.9})
    rows.append({"id1": "c", "id2": "d", "sim": 0.1})
    out = kruskal_likelihood_block(pd.DataFrame(rows))
    reps = out.set_index("id")["cluster_rep"].to_dict()
    assert reps["a"] == reps["b"] == reps["c"] == "a"
    assert reps["d"] == reps["e"] == reps["f"] == "d"
    assert reps["a"] != reps["d"]


def test_kruskal_constrained_cannot_link():
    from dedup_ray.conformance.cluster import (
        kruskal_constrained_block,
        kruskal_constrained_cluster,
    )

    # one clique of 4 (all sim .9): unconstrained merges everything,
    # cannot_link={a,d} must keep a and d in distinct components
    rows = [
        {"id1": a, "id2": b, "sim": 0.9}
        for a, b in it.combinations(list("abcd"), 2)
    ]
    free = kruskal_constrained_block(pd.DataFrame(rows))
    assert free["cluster_rep"].nunique() == 1

    out = kruskal_constrained_block(pd.DataFrame(rows), {"a", "d"})
    reps = out.set_index("id")["cluster_rep"].to_dict()
    assert reps["a"] != reps["d"]
    assert len(set(reps.values())) == 2  # everything else merged maximally

    # dup=2 allowance stops after n-1-dup=1 accepted edge → 3 components
    capped = kruskal_constrained_block(pd.DataFrame(rows), frozenset(), dup=2)
    assert capped["cluster_rep"].nunique() == 3


def test_kruskal_constrained_cluster_per_block():
    from dedup_ray.conformance.cluster import kruskal_constrained_cluster

    rows = []
    for blk in ("n1", "n2"):
        for a, b in it.combinations([f"{blk}-{x}" for x in "abc"], 2):
            rows.append({"name": blk, "id1": a, "id2": b, "sim": 0.8})
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = kruskal_constrained_cluster(
        ds, cannot_link={"n1": {"n1-a", "n1-c"}}
    ).to_pandas()
    reps = out.set_index("id")["cluster_rep"].to_dict()
    assert reps["n1-a"] != reps["n1-c"]  # constrained block split
    assert reps["n2-a"] == reps["n2-b"] == reps["n2-c"]  # free block merged


def test_affinity_propagation_planted_blobs():
    """G9: AP recovers planted line blobs; exemplars are the blob centers."""
    from dedup_ray.conformance.cluster import affinity_propagation_block

    xs = [0, 1, 2, 10, 11, 12, 20, 21, 22]
    rows = [
        (i, j, -abs(xs[i] - xs[j]))
        for i, j in it.combinations(range(len(xs)), 2)
    ]
    pairs = pd.DataFrame(rows, columns=["id1", "id2", "sim"])
    out = affinity_propagation_block(pairs)
    groups = sorted(
        sorted(g) for g in out.groupby("cluster_rep")["id"].apply(list)
    )
    assert groups == [[0, 1, 2], [3, 4, 5], [6, 7, 8]]
    # exemplars are members of their own cluster (the blob centers here)
    assert set(out["cluster_rep"]) == {1, 4, 7}
    # deterministic: no jitter, identical rerun
    assert out.equals(affinity_propagation_block(pairs))


def test_affinity_propagation_distributed_matches_local():
    from dedup_ray.conformance.cluster import (
        affinity_propagation_block,
        affinity_propagation_cluster,
    )

    rng = np.random.RandomState(7)
    frames = []
    for blk in ("a", "b", "c"):
        xs = np.sort(rng.randint(0, 100, size=12))
        a, b = np.triu_indices(len(xs), k=1)
        frames.append(
            pd.DataFrame(
                {
                    "name": blk,
                    "id1": a,
                    "id2": b,
                    "sim": -np.abs(xs[a] - xs[b]).astype(float),
                }
            )
        )
    pairs = pd.concat(frames, ignore_index=True)
    got = (
        affinity_propagation_cluster(rd.from_pandas(pairs), block_col="name")
        .to_pandas()
        .sort_values(["name", "id"])
        .reset_index(drop=True)
    )
    want = []
    for blk, g in pairs.groupby("name"):
        o = affinity_propagation_block(g[["id1", "id2", "sim"]])
        o.insert(0, "name", blk)
        want.append(o)
    want = (
        pd.concat(want, ignore_index=True)
        .sort_values(["name", "id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_affinity_propagation_degenerate():
    from dedup_ray.conformance.cluster import affinity_propagation_block

    # single pair: one cluster, exemplar = lower id
    p2 = pd.DataFrame({"id1": [0], "id2": [1], "sim": [-1.0]})
    out = affinity_propagation_block(p2)
    assert len(out) == 2 and out["cluster_rep"].nunique() == 1
    # every point assigned exactly once
    assert out["id"].is_unique


def test_ap_cluster_docs_singleton_block(tmp_path):
    """A one-doc source must still get a cluster row (its own exemplar)."""
    import pyarrow.parquet as pq

    tab = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "source": pa.array(["solo", "duo", "duo", "duo"]),
            "n_chars": pa.array([5, 7, 8, 100], pa.int64()),
            "text": pa.array(["a", "b", "c", "d"]),
            "lang": pa.array(["en"] * 4),
        }
    )
    pq.write_table(tab, tmp_path / "documents.parquet")
    from dedup_ray.pipelines.queries import QUERIES

    out = QUERIES["ap_cluster_docs"](str(tmp_path)).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2, 3, 4]
    assert out.set_index("doc_id").loc[1, "cluster_rep"] == 1
