"""Sixth-sitting operators: FastSS edit-distance join, KMV set-op
sketches, exact quantile bisection, (w,k)-minimizers, Hilbert keys."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data


def _lev(a: str, b: str) -> int:
    """Reference Levenshtein DP, for verifying the fast distance-1 check."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


class TestEditJoin:
    def test_edit1_check_matches_dp(self):
        from dedup_ray.ops.editjoin import _edit1

        vocab = ["abc", "abd", "ab", "ba", "abcd", "acbd", "xyz",
                 "abce", "bbc", "abc", "aabc", "", "a"]
        for a in vocab:
            for b in vocab:
                assert _edit1(a, b) == (_lev(a, b) <= 1), (a, b)

    def test_self_join_equals_bruteforce(self):
        from dedup_ray.ops.editjoin import edit_distance_self_join

        vocab = ["ring", "rings", "rink", "wing", "abcd", "badc",
                 "gear", "gea", "gearx", "year", "small", "smell",
                 "ssmall", "widget", "widgot", "wodget", "token"]
        ds = ray.data.from_arrow(
            pa.table({"token": pa.array(vocab * 3, pa.string())}))
        got = edit_distance_self_join(ds, "token", min_len=4,
                                      num_partitions=4).take_all()
        got_pairs = {(r["t1"], r["t2"]) for r in got}
        u = sorted({t for t in vocab if len(t) >= 4})
        want = {(a, b) for i, a in enumerate(u) for b in u[i + 1:]
                if _lev(a, b) <= 1}
        assert got_pairs == want
        # the transposition false-candidates (abcd/badc) must be rejected
        assert ("abcd", "badc") not in got_pairs

    def test_variant_group_cap_is_an_undercount(self):
        from dedup_ray.ops.editjoin import edit_distance_self_join

        # 26 tokens 'Xbcd' all share the deletion variant 'bcd'
        vocab = [c + "bcd" for c in "abcdefghijklmnopqrstuvwxyz"]
        ds = ray.data.from_arrow(pa.table({"token": pa.array(vocab)}))
        full = edit_distance_self_join(
            ds, "token", min_len=4, num_partitions=2,
            max_variant_group=None).count()
        capped = edit_distance_self_join(
            ds, "token", min_len=4, num_partitions=2,
            max_variant_group=4).count()
        assert full == 26 * 25 // 2
        assert capped < full


class TestKMV:
    def test_complete_sets_are_exact(self):
        from dedup_ray.stages.sketch import kmv_grouped_sketch, kmv_set_ops

        rows = [("a", f"t{i}") for i in range(30)] + \
               [("b", f"t{i}") for i in range(20, 50)]
        ds = ray.data.from_arrow(pa.table({
            "g": pa.array([r[0] for r in rows]),
            "v": pa.array([r[1] for r in rows])}))
        sk = kmv_grouped_sketch(ds, "g", "v", k=128, num_partitions=2)
        out = kmv_set_ops(sk, "g", k=128).to_pylist()
        assert len(out) == 1
        r = out[0]
        assert (r["g1"], r["g2"]) == ("a", "b")
        assert r["union_est"] == 50.0
        assert r["intersect_est"] == 10.0
        assert r["jaccard_est"] == round(10 / 50, 4)

    def test_estimates_within_theta_sketch_error(self):
        from dedup_ray.stages.sketch import kmv_grouped_sketch, kmv_set_ops

        n, overlap, k = 5000, 1000, 256
        a_vals = [f"a{i}" for i in range(n - overlap)] + \
                 [f"s{i}" for i in range(overlap)]
        b_vals = [f"b{i}" for i in range(n - overlap)] + \
                 [f"s{i}" for i in range(overlap)]
        ds = ray.data.from_arrow(pa.table({
            "g": pa.array(["a"] * n + ["b"] * n),
            "v": pa.array(a_vals + b_vals)}))
        sk = kmv_grouped_sketch(ds, "g", "v", k=k, num_partitions=4)
        r = kmv_set_ops(sk, "g", k=k).to_pylist()[0]
        true_union = 2 * n - overlap
        # KMV relative error ~ 1/sqrt(k-2) ≈ 6.3%; allow 5 sigma
        assert abs(r["union_est"] - true_union) / true_union < 0.32
        true_j = overlap / true_union
        assert abs(r["jaccard_est"] - true_j) < 5 * np.sqrt(
            true_j * (1 - true_j) / k) + 0.02

    def test_sketch_is_mergeable(self):
        """k smallest of a union == combine of per-part k smallest —
        checked by feeding the same values in 1 partition vs many."""
        from dedup_ray.stages.sketch import kmv_grouped_sketch

        vals = [f"v{i}" for i in range(1000)]
        ds1 = ray.data.from_arrow(pa.table(
            {"g": pa.array(["x"] * 1000), "v": pa.array(vals)}))
        got1 = sorted(r["hv"] for r in kmv_grouped_sketch(
            ds1, "g", "v", k=64, num_partitions=1).take_all())
        ds8 = ray.data.from_arrow_refs([
            ray.put(pa.table({"g": pa.array(["x"] * 125),
                              "v": pa.array(vals[i:i + 125])}))
            for i in range(0, 1000, 125)])
        got8 = sorted(r["hv"] for r in kmv_grouped_sketch(
            ds8, "g", "v", k=64, num_partitions=4).take_all())
        assert got1 == got8 and len(got1) == 64


class TestExactQuantiles:
    def _check(self, values, qs):
        import math

        from dedup_ray.stages.ordering import exact_quantiles

        ds = ray.data.from_arrow(pa.table(
            {"value": pa.array(values, pa.float64())}))
        out = {r["q"]: r["value"]
               for r in exact_quantiles(ds, "value", qs,
                                        collect_limit=8).to_pylist()}
        srt = sorted(values)
        for q in qs:
            k = 1 + math.floor(q * (len(values) - 1))
            assert out[q] == round(srt[k - 1], 6), (q, out[q], srt[k - 1])

    def test_random_doubles(self):
        rng = np.random.default_rng(7)
        self._check(rng.normal(50, 20, 5000).tolist(),
                    [0.0, 0.25, 0.5, 0.9, 0.99, 1.0])

    def test_heavy_ties(self):
        # one value dominating: the interval can never shrink below it
        vals = [3.0] * 4000 + [1.0, 2.0, 4.0, 5.0] * 10
        self._check(vals, [0.1, 0.5, 0.99])

    def test_tiny_and_single(self):
        self._check([42.0], [0.0, 0.5, 1.0])
        self._check([2.0, 1.0], [0.0, 0.5, 1.0])


class TestMinimizers:
    @staticmethod
    def _naive(text, k, w):
        import hashlib

        n_pos = len(text) - k + 1
        if n_pos < 1:
            return set()
        hv = [hashlib.md5(text[j:j + k].encode()).hexdigest()[:16]
              for j in range(n_pos)]
        n_win = max(1, n_pos - w + 1)
        return {min(hv[j:j + w]) for j in range(n_win)}

    def test_matches_naive(self):
        from dedup_ray.stages.shingle import minimizer_rows

        rng = np.random.default_rng(3)
        texts = ["".join(rng.choice(list("abcd "), size=n))
                 for n in [0, 3, 8, 9, 20, 100, 400]]
        texts.append(None)
        got = minimizer_rows(texts, k=8, w=16)
        for txt, m in zip(texts, got):
            assert set(m) == self._naive(txt or "", 8, 16)

    def test_shared_substring_shares_minimizers(self):
        """An aligned shared substring longer than w+k-1 pins at least one
        shared FULL window, hence a shared minimizer — the candidate-
        generation guarantee."""
        from dedup_ray.stages.shingle import minimizer_rows

        rng = np.random.default_rng(9)

        def rand(n):
            return "".join(rng.choice(list("abcdefgh"), size=n))

        core = rand(60)  # > w + k - 1 = 23
        a, b = rand(40) + core + rand(40), rand(25) + core
        ma, mb = minimizer_rows([a, b], k=8, w=16)
        assert set(ma) & set(mb)

    def test_density(self):
        """Minimizer count ≈ 2/(w+1) of positions on random text."""
        from dedup_ray.stages.shingle import minimizer_rows

        rng = np.random.default_rng(1)
        txt = "".join(rng.choice(list("abcdefghijklmnop"), size=20000))
        (m,) = minimizer_rows([txt], k=8, w=16)
        density = len(m) / (len(txt) - 8 + 1)
        assert 0.8 * 2 / 17 < density < 1.3 * 2 / 17


class TestHilbert:
    def test_bijection_and_unit_steps(self):
        from dedup_ray.stages.ordering import hilbert_key

        bits, n = 5, 32
        xs, ys = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
        ds = ray.data.from_arrow(pa.table({
            "i": pa.array(np.arange(n * n)),
            "x": pa.array(xs.ravel()), "y": pa.array(ys.ravel())}))
        rows = hilbert_key(ds, "x", "y", bits=bits).take_all()
        d = np.empty(n * n, np.int64)
        pos = np.empty((n * n, 2), np.int64)
        for r in rows:
            d[r["i"]] = r["hkey"]
        assert len(set(d.tolist())) == n * n  # bijection onto [0, n^2)
        assert d.min() == 0 and d.max() == n * n - 1
        for r in rows:
            pos[r["hkey"]] = (r["x"], r["y"])
        steps = np.abs(np.diff(pos, axis=0)).sum(axis=1)
        assert (steps == 1).all()  # the defining Hilbert property

    def test_sql_twin_matches(self):
        import duckdb

        from dedup_ray.stages.ordering import hilbert_key, hilbert_sql

        n = 16
        ds = ray.data.from_arrow(pa.table({
            "i": pa.array(np.arange(n * n)),
            "x": pa.array(np.arange(n * n) // n),
            "y": pa.array(np.arange(n * n) % n)}))
        rows = hilbert_key(ds, "x", "y", bits=4).take_all()
        kern = {r["i"]: r["hkey"] for r in rows}
        con = duckdb.connect()
        con.sql(f"CREATE TABLE pts AS SELECT unnest(range({n * n})) AS i")
        sql = hilbert_sql("i", f"i // {n}", f"i % {n}", "pts", bits=4)
        for i, hk in con.sql(sql).fetchall():
            assert kern[i] == hk

    def test_range_check(self):
        from dedup_ray.stages.ordering import hilbert_key

        ds = ray.data.from_arrow(pa.table({"x": pa.array([4]),
                                           "y": pa.array([0])}))
        with pytest.raises(Exception):
            hilbert_key(ds, "x", "y", bits=2).take_all()
