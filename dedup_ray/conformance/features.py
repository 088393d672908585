"""Reference pair features, keyed (SURVEY.md §1.3: keys, never positions).

Implements, per block and per canonical pair (id1 < id2):

- the five ``c_<field>`` columns with the exact ``c_org.py:18-39`` formulas
  (multiset intersection via min-counts, TF = 1/(len_a·len_b),
  logIDF = Σ log(idf_k·c_k + 1), jaccard = overlap/(sumlen−overlap));
- ``diff_year`` = |Δyear| / (block max − block min) (``diff_year.py:14-18``);
- pair labels from truth clusters with singleton gap-fill and
  multi-assignment intersect (``label.py:23-30``).

Token multisets follow ``wordlist.py:23-32`` (M4): split on single spaces;
an empty field contributes the record's own id as its only token.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd

from dedup_ray.util.dsutil import as_arrow


def tokens_of(value, rid: str) -> list[str]:
    """M4 semantics incl. the null sentinel (``wordlist.py:24-27``)."""
    if value is None or (isinstance(value, float) and np.isnan(value)) or value == "":
        return [rid]
    return [t for t in str(value).split(" ") if t != ""]


def pair_feature_columns(
    ds,
    block_col: str,
    id_col: str,
    field_col: str,
    idf: dict[str, float],
    prefix: str | None = None,
):
    """→ Dataset(block, id1, id2, <f>_overlap, <f>_share_dummy,
    <f>_jaccard_similarity_metric, <f>_logIDF, <f>_logTFIDF).

    ``idf`` is the broadcast A1 dictionary (``c_org.py:15-16`` ST3 pattern);
    tokens missing from it contribute idf=0 (log(0·c+1)=0, matching the
    reference's KeyError-free case only when the IDF covers the corpus —
    we pass the full-corpus IDF as the reference does).
    """
    import ray

    p = prefix or field_col
    ref = ray.put(idf)

    def gen(group: pd.DataFrame) -> pd.DataFrame:
        zd = ray.get(ref)
        g = group.drop_duplicates(subset=[id_col]).sort_values(id_col)
        ids = g[id_col].tolist()
        toks = [tokens_of(v, i) for v, i in zip(g[field_col], ids)]
        counters = [Counter(t) for t in toks]
        n = len(ids)
        rows = {
            block_col: [], "id1": [], "id2": [],
            f"{p}_overlap": [], f"{p}_share_dummy": [],
            f"{p}_jaccard_similarity_metric": [],
            f"{p}_logIDF": [], f"{p}_logTFIDF": [],
        }
        for a in range(n):
            for b in range(a + 1, n):
                common = counters[a] & counters[b]
                overlap = float(sum(common.values()))
                sumlength = len(toks[a]) + len(toks[b])
                tf = 1.0 / float(len(toks[a]) * len(toks[b]))
                if not common:
                    log_idf = 0.0
                else:
                    lu = np.array([zd.get(k, 0.0) for k in common.keys()])
                    cc = np.array(list(common.values()), dtype=float)
                    log_idf = float(np.log(lu * cc + 1).sum())
                rows[block_col].append(group[block_col].iloc[0])
                rows["id1"].append(ids[a])
                rows["id2"].append(ids[b])
                rows[f"{p}_overlap"].append(np.float32(overlap))
                rows[f"{p}_share_dummy"].append(bool(overlap != 0))
                rows[f"{p}_jaccard_similarity_metric"].append(
                    np.float32(overlap) / np.float32(sumlength - overlap)
                )
                rows[f"{p}_logIDF"].append(np.float32(log_idf))
                rows[f"{p}_logTFIDF"].append(np.float32(log_idf) * np.float32(tf))
        return pd.DataFrame(rows)

    return as_arrow(ds.groupby(block_col).map_groups(gen, batch_format="pandas"))


def diff_year_pairs(ds, block_col: str, id_col: str, year_col: str = "year"):
    """``diff_year.py``: |Δyear| / (block max − min), over distinct rows
    sorted by id.  Keyed output, float32 ('f4')."""

    def gen(group: pd.DataFrame) -> pd.DataFrame:
        yearspan = group[year_col].max() - group[year_col].min()
        g = (
            group[[id_col, year_col]]
            .drop_duplicates()
            .sort_values(id_col)
        )
        ids = g[id_col].tolist()
        years = g[year_col].tolist()
        n = len(ids)
        b, i1, i2, dy = [], [], [], []
        for a in range(n):
            for c in range(a + 1, n):
                b.append(group[block_col].iloc[0])
                i1.append(ids[a])
                i2.append(ids[c])
                dy.append(
                    np.float32(abs(years[a] - years[c])) / np.float32(yearspan)
                    if yearspan
                    else np.float32(0.0)
                )
        return pd.DataFrame({block_col: b, "id1": i1, "id2": i2, "diff_year": dy})

    return as_arrow(ds.groupby(block_col).map_groups(gen, batch_format="pandas"))


def pair_labels(ds, assignment_df: pd.DataFrame, block_col: str = "name",
                id_col: str = "id"):
    """``label.py``: per block, seq per truth cluster; ids absent from truth
    get fresh singleton seqs (:23-26); pair label = same-first-seq OR
    non-empty seq-set intersection (:29-30).  Keyed output."""
    import ray

    ref = ray.put(assignment_df)

    def gen(group: pd.DataFrame) -> pd.DataFrame:
        adf = ray.get(ref)
        name = group[block_col].iloc[0]
        d = adf[adf[block_col] == name][[id_col, "cluster_seq"]].rename(
            columns={"cluster_seq": "seq"}
        )
        idl = group[[id_col]].drop_duplicates()
        rid = np.setdiff1d(idl[id_col].values, d[id_col].values)
        start = (d["seq"].max() + 1) if len(d) else 0
        d = pd.concat(
            [d, pd.DataFrame({id_col: rid, "seq": range(start, start + len(rid))})]
        )
        seqs = {
            k: v["seq"].values for k, v in d.groupby(id_col)
        }  # pandas groupby sorts keys — canonical order
        ids = sorted(seqs)
        b, i1, i2, lab = [], [], [], []
        for a in range(len(ids)):
            for c in range(a + 1, len(ids)):
                sa, sc = seqs[ids[a]], seqs[ids[c]]
                same = (sa[0] == sc[0]) or (np.intersect1d(sa, sc).size > 0)
                b.append(name)
                i1.append(ids[a])
                i2.append(ids[c])
                lab.append(np.float32(1.0 if same else 0.0))
        return pd.DataFrame({block_col: b, "id1": i1, "id2": i2, "label": lab})

    return as_arrow(ds.groupby(block_col).map_groups(gen, batch_format="pandas"))


def idf_dict(token_lists: list[list[str]]) -> dict[str, float]:
    """A1 driver-side oracle: IDF(t) = total_rows / count(t) (``IDF.py``)."""
    allt = [t for ts in token_lists for t in ts]
    cnt = Counter(allt)
    total = float(len(allt))
    return {k: total / v for k, v in cnt.items()}
