"""M1 nested-record exploder vs a per-record Python oracle."""

import pandas as pd
import ray.data as rd

from dedup_ray.conformance.explode import explode_pubs
from dedup_ray.conformance.pubs import make_pubs


def oracle_tables(pubs: pd.DataFrame) -> dict:
    item, author, abstract, keywords = [], [], [], []
    for _, r in pubs.iterrows():
        item.append((r["id"], r["title"], r["venue"], r["year"]))
        for seq, a in enumerate(r["authors"], start=1):  # 1-based rownames
            author.append((a["name"], a["org"], r["id"], seq))
        if r["abstract"] is not None:
            abstract.append((r["id"], r["abstract"]))
        for k in r["keywords"]:
            keywords.append((k, r["id"]))
    return {
        "item": pd.DataFrame(item, columns=["id", "title", "venue", "year"]),
        "author": pd.DataFrame(author, columns=["name", "org", "id", "auseq"]),
        "abstract": pd.DataFrame(abstract, columns=["id", "abstract"]),
        "keywords": pd.DataFrame(keywords, columns=["keywords", "id"]),
    }


def test_explode_matches_oracle(ray_session):
    pubs, _ = make_pubs(seed=42)
    got = {
        name: ds.to_pandas() for name, ds in explode_pubs(rd.from_arrow(pubs)).items()
    }
    expect = oracle_tables(pubs.to_pandas())
    for name in ("item", "author", "abstract", "keywords"):
        g = got[name].sort_values(list(got[name].columns)).reset_index(drop=True)
        e = (
            expect[name]
            .sort_values(list(expect[name].columns))
            .reset_index(drop=True)
        )
        assert len(g) == len(e), name
        pd.testing.assert_frame_equal(
            g, e, check_dtype=False, check_like=True
        ), name


def test_author_auseq_is_positional(ray_session):
    pubs, _ = make_pubs(seed=42)
    author = explode_pubs(rd.from_arrow(pubs))["author"].to_pandas()
    # every record's auseq sequence is exactly 1..n_authors
    for rid, sub in author.groupby("id"):
        assert sorted(sub["auseq"]) == list(range(1, len(sub) + 1)), rid
