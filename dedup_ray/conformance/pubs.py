"""Reference-shaped conformance fixture (FIXTURES.md F2/F2t).

Deterministic synthetic publication records mirroring the reference's data
model (``data_transfer.R:26-45``): blocks keyed by ambiguous author name,
nested authors list, nullable abstract, list-valued keywords — enough
structure to conformance-test the pair machinery (canonical order, token
features, labels, clustering, F1).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from dedup_ray.util.hashing import stable64

_VENUES = [
    "Intl. Conf. on Data, 2017 (3rd)",
    "Journal of Things, Vol. 4",
    "Proc. 12th Workshop-on/Systems",
    "Data: Mining & 'Learning' 1999",
]
_ORGS = [
    "Tsinghua University",
    "MIT CSAIL Lab",
    "Uni of Nowhere",
    "Tsinghua University",  # duplicated on purpose (multiset semantics)
    "",
]
_WORDS = (
    "deep learning graph neural network mining streaming entity resolution "
    "database query optimization author disambiguation record linkage"
).split()


def _hexid(tag: str) -> str:
    """24-char hex id, same shape as the reference's S24 ids."""
    a = stable64(tag, seed=1)
    b = stable64(tag, seed=2)
    return f"{a:016x}{b:016x}"[:24]


def make_pubs(seed: int = 42) -> tuple[pa.Table, pa.Table]:
    """→ (pubs, assignment).  3 blocks × 6–12 records with planted clusters.

    The assignment includes one id absent from any truth cluster
    (``label.py:23-26`` gap-fill) and one id present in two clusters
    (``label.py:29-30`` / ``evaluate.py:83-115`` multi-assignment).
    """
    rng = np.random.default_rng(seed)
    rows = []
    truth_rows = []
    for b, name in enumerate(["jing_zhang", "wei_wang", "li_li"]):
        n_entities = 2 + b % 2
        rec = 0
        for ent in range(n_entities):
            n_recs = int(rng.integers(3, 6))
            org = _ORGS[(b + ent) % len(_ORGS)]
            for r in range(n_recs):
                rid = _hexid(f"{name}/{ent}/{r}")
                title_words = rng.choice(_WORDS, size=int(rng.integers(4, 8)))
                rows.append(
                    {
                        "name": name,
                        "id": rid,
                        "title": " ".join(title_words) + " 2015 3rd ed.",
                        "venue": _VENUES[int(rng.integers(0, len(_VENUES)))],
                        "year": int(2000 + rng.integers(0, 20)),
                        "keywords": list(rng.choice(_WORDS, size=int(rng.integers(0, 4)))),
                        "abstract": (
                            " ".join(rng.choice(_WORDS, size=10))
                            if rng.random() > 0.3
                            else None
                        ),
                        "authors": [
                            {"name": name.replace("_", " "), "org": org},
                            {
                                "name": f"coauthor {int(rng.integers(0, 6))}",
                                "org": _ORGS[int(rng.integers(0, len(_ORGS)))],
                            },
                        ],
                    }
                )
                truth_rows.append({"name": name, "cluster_seq": ent, "id": rid})
                rec += 1
        # gap-fill case: one record absent from truth
        rid = _hexid(f"{name}/unlabeled")
        rows.append(
            {
                "name": name,
                "id": rid,
                "title": "unlabeled record",
                "venue": _VENUES[0],
                "year": 2010,
                "keywords": [],
                "abstract": None,
                "authors": [{"name": name.replace("_", " "), "org": ""}],
            }
        )
    # multi-assignment: first record of block 0 also appears in cluster 1
    truth_rows.append(
        {"name": "jing_zhang", "cluster_seq": 1, "id": truth_rows[0]["id"]}
    )

    pubs = pa.Table.from_pylist(rows)
    assignment = pa.Table.from_pylist(truth_rows)
    return pubs, assignment
