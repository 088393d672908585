"""PLSA topic modeling over the corpus (Hofmann, SIGIR 1999).

The probabilistic topic decomposition a curation pipeline uses for
topic-balanced mixing and topical near-dup screens: factor the
doc-word count matrix as ``P(w|d) = Σ_z P(z|d) P(w|z)`` by EM, run a
FIXED number of rounds so the SQL twin can unroll them (the
convergence-free convention of ``stages/kmeans.py`` and the Weiszfeld
median).

Distributed shape (the broadcast-EM pattern of ``kmeans_lloyd``):

- the topic-word model ``P(w|z)`` is bounded state (vocab × k floats;
  web-scale runs cap the modeled vocab and pool the tail — same policy
  as the BPE trainer's histogram bound) broadcast per round;
- the doc-topic posteriors ``P(z|d)`` are NEVER materialized between
  rounds: each pass recomputes the per-doc chain from the broadcast
  model HISTORY (uniform init → round 0 → … → round r), so no doc-keyed
  exchange exists at all — total cost O(rounds² · tokens), a deliberate
  recompute-over-shuffle trade;
- each pass emits per-batch partial ``Σ_d c(d,w)·γ_z(d,w)`` tables
  (vocab × k), folded on the driver into the next model.

Determinism: init ``P0(w|z) ∝ 1 + u(z,w)`` with ``u`` the md5-prefix
uniform (``md5('plsa:{z}:{w}')[:8] / 2^32``) — a pure function of the
token string that any engine can replay; uniform ``P0(z|d) = 1/k``.
E-step denominators are written as the explicit left-associated
``p0·q0 + p1·q1 + p2·q2`` sum in BOTH engines.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray


def _token_counts(texts: list) -> list:
    """Per-doc (token -> count) dicts from space-split non-empty tokens."""
    out = []
    for tx in texts:
        toks = [w for w in (tx or "").split(" ") if w]
        d: dict = {}
        for w in toks:
            d[w] = d.get(w, 0) + 1
        out.append(d)
    return out


def _init_model(vocab: list[str], k: int) -> np.ndarray:
    """(vocab, k) init: column z ∝ 1 + md5-uniform('plsa:{z}:{w}')."""
    q = np.empty((len(vocab), k), dtype=np.float64)
    for zi in range(k):
        for wi, w in enumerate(vocab):
            u = int(hashlib.md5(f"plsa:{zi}:{w}".encode()).hexdigest()[:8],
                    16) / 4294967296.0
            q[wi, zi] = 1.0 + u
    return q / q.sum(axis=0, keepdims=True)


def _doc_chain(w_idx: np.ndarray, c: np.ndarray, models: list[np.ndarray],
               k: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Recompute one doc's P(z|d) chain through all completed rounds.

    Returns (pz, nz, den): the CURRENT posterior P(z|d) plus the last
    round's per-word numerators/denominator under the LATEST model
    (what the caller folds into the M-step partials).
    """
    cd = float(c.sum())
    pz = np.full(k, 1.0 / k)
    nz = den = None
    for q in models:
        qw = q[w_idx]                       # (nw, k)
        nz = pz[None, :] * qw               # p_z * q_z(w)
        den = nz[:, 0] + nz[:, 1] + nz[:, 2]  # explicit left-assoc sum
        # (c*n)/den association mirrors the SQL twin's c*n0/den
        pz = ((c[:, None] * nz) / den[:, None]).sum(axis=0) / cd
    return pz, nz, den


def plsa_topics(ds, id_col: str = "doc_id", text_col: str = "text",
                k: int = 3, rounds: int = 2):
    """Run ``rounds`` EM rounds; return ``(doc_topics_ds, model)``.

    ``doc_topics_ds`` has one row per doc with ≥1 token:
    ``(id_col, pz0..pz{k-1})`` — P(z|d) under the FINAL model, rounded
    6dp.  ``model`` is the (vocab, k) float64 ``P(w|z)`` plus the vocab
    list, bounded driver state.
    """
    assert k == 3, "explicit-sum parity is written for k=3"

    def tok_rows(t: pa.Table) -> pa.Table:
        txt = t[text_col]
        if isinstance(txt, pa.ChunkedArray):
            txt = txt.combine_chunks()
        txt = pc.coalesce(txt, pa.scalar("", pa.string()))
        flat = pc.list_flatten(pc.split_pattern(txt, " "))
        flat = flat.filter(pc.not_equal(flat, pa.scalar("")))
        return pa.table({"w": flat})

    vdf = ds.map_batches(tok_rows, batch_format="pyarrow") \
        .groupby("w").count().to_pandas()
    if vdf.empty:  # zero-token corpus: Ray drops columns at 0 rows
        import ray.data as _rd

        empty = pa.table({id_col: pa.array([], pa.int64()),
                          **{f"pz{z}": pa.array([], pa.float64())
                             for z in range(k)}})
        return _rd.from_arrow(empty), ([], np.zeros((0, k)))
    vocab = sorted(vdf["w"].tolist())
    widx = {w: i for i, w in enumerate(vocab)}
    v = len(vocab)
    models = [_init_model(vocab, k)]

    for _ in range(rounds):
        hist_ref = ray.put([m.copy() for m in models])

        def m_partial(t: pa.Table, _h=hist_ref) -> pa.Table:
            hist = ray.get(_h)
            s = np.zeros((v, k), dtype=np.float64)
            texts = t[text_col].to_pylist()
            for cnts in _token_counts(texts):
                if not cnts:
                    continue
                ws = np.array([widx[w] for w in cnts], dtype=np.int64)
                cs = np.array(list(cnts.values()), dtype=np.float64)
                _, nz, den = _doc_chain(ws, cs, hist, k)
                np.add.at(s, ws, (cs[:, None] * nz) / den[:, None])
            cols = {"w_i": pa.array(np.arange(v), pa.int64())}
            for zi in range(k):
                cols[f"s{zi}"] = pa.array(s[:, zi], pa.float64())
            return pa.table(cols)

        parts = ds.map_batches(m_partial, batch_format="pyarrow") \
            .to_pandas().groupby("w_i", sort=True).sum()
        s = parts[[f"s{zi}" for zi in range(k)]].to_numpy()
        models.append(s / s.sum(axis=0, keepdims=True))

    final_ref = ray.put([m.copy() for m in models])

    def posterior(t: pa.Table, _h=final_ref) -> pa.Table:
        hist = ray.get(_h)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        texts = t[text_col].to_pylist()
        out_id, out_p = [], []
        for i, cnts in enumerate(_token_counts(texts)):
            if not cnts:
                continue
            ws = np.array([widx[w] for w in cnts], dtype=np.int64)
            cs = np.array(list(cnts.values()), dtype=np.float64)
            pz, _, _ = _doc_chain(ws, cs, hist, k)
            out_id.append(int(ids[i]))
            out_p.append(np.round(pz, 6))
        cols = {id_col: pa.array(out_id, pa.int64())}
        p = np.array(out_p) if out_p else np.zeros((0, k))
        for zi in range(k):
            cols[f"pz{zi}"] = pa.array(p[:, zi], pa.float64())
        return pa.table(cols)

    return ds.map_batches(posterior, batch_format="pyarrow"), \
        (vocab, models[-1])
