"""URL canonicalization for web-crawl dedup (the M2 normalizer analog for
the pages domain: ``venue_author_preprocess.R:17-28``'s normalize-before-compare step,
re-targeted at the engine's native id space).

Two URLs that differ only in scheme/host case, default port, tracking
parameters or fragment are the same page to a crawler; canonicalizing
before URL-keyed dedup/grouping is the standard first pass of a web
pipeline.  All rules are RE2-safe (no lookarounds) and applied with global
replace, so the SAME rule list drives the vectorized Arrow kernel here and
the DuckDB oracle (both engines embed RE2 → match-for-match parity, the
``bpe_token_counts`` trick).

Rule order matters and is part of the spec:

1. strip ``#fragment``;
2. strip tracking parameters (``utm_*``, ``fbclid``, ``gclid``) — the
   mid-query rule runs ``_TRACKING_PASSES`` times because global replace
   does not rescan the string it just rewrote (``?a=1&utm_x=2&utm_y=3``
   needs two passes), then a tail rule catches a final tracking param;
3. lowercase scheme+host (authority), leave path/query case alone;
4. strip default ports (``http://…:80``, ``https://…:443``);
5. drop a bare root slash (``http://h/`` → ``http://h``) and any dangling
   ``?`` / ``&`` the parameter strip left behind.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

_TRACKING = r"(?:utm_[A-Za-z0-9_]+|fbclid|gclid)"
_TRACKING_PASSES = 3

# (pattern, replacement) applied in order with global replace; replacement
# backreference syntax ``\\1`` works in both Arrow and DuckDB.
URL_RULES_PRE_LOWER: list[tuple[str, str]] = [
    (r"#.*$", ""),  # fragment
] + [
    # ?utm_x=…& → ?   /   &utm_x=…& → &   (repeated: no rescan per pass)
    (rf"([?&]){_TRACKING}=[^&]*&", r"\1")
    for _ in range(_TRACKING_PASSES)
] + [
    (rf"[?&]{_TRACKING}=[^&]*$", ""),  # tracking param in tail position
]

# applies AFTER the authority is lowercased
URL_RULES_POST_LOWER: list[tuple[str, str]] = [
    (r"^(http://[^/:?#]+):80([/?#]|$)", r"\1\2"),
    (r"^(https://[^/:?#]+):443([/?#]|$)", r"\1\2"),
    (r"^(https?://[^/?#]+)/$", r"\1"),  # bare root slash
    (r"[?&]$", ""),  # dangling separator after param strip
]

# authority split: group 1 = scheme://host[:port], group 2 = rest
_AUTHORITY = r"^(?P<auth>[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)(?P<rest>.*)$"


def normalize_url_array(urls: pa.Array) -> pa.Array:
    """Vectorized canonicalization of a string array (Arrow RE2 kernels)."""
    out = urls
    for pat, repl in URL_RULES_PRE_LOWER:
        out = pc.replace_substring_regex(out, pat, replacement=repl)
    groups = pc.extract_regex(out, _AUTHORITY)
    auth = pc.utf8_lower(pc.struct_field(groups, "auth"))
    rest = pc.struct_field(groups, "rest")
    # URLs without a scheme://authority shape pass through unchanged
    lowered = pc.binary_join_element_wise(auth, rest, "")
    out = pc.coalesce(lowered, out)
    for pat, repl in URL_RULES_POST_LOWER:
        out = pc.replace_substring_regex(out, pat, replacement=repl)
    return out


def extract_host_array(urls: pa.Array) -> pa.Array:
    """Registrable host (lowercased, port stripped) per URL; null if none."""
    g = pc.extract_regex(urls, r"^[A-Za-z][A-Za-z0-9+.-]*://(?P<host>[^/:?#]+)")
    return pc.utf8_lower(pc.struct_field(g, "host"))


def normalize_urls(ds, url_col: str = "url", out_col: str = "url_norm"):
    """Dataset stage: append canonicalized URL + host columns."""

    def f(batch: pa.Table) -> pa.Table:
        urls = batch[url_col]
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        return batch.append_column(
            out_col, normalize_url_array(urls)
        ).append_column("host", extract_host_array(urls))

    return ds.map_batches(f, batch_format="pyarrow")


def oracle_sql_expr(col: str) -> str:
    """DuckDB expression mirroring :func:`normalize_url_array` rule-for-rule
    (generated from the SAME constants, so the oracle cannot drift)."""
    expr = col
    for pat, repl in URL_RULES_PRE_LOWER:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    auth = r"'^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)(.*)$'"
    # DuckDB regexp_extract returns '' (not NULL) on no match, so gate the
    # lowercase rewrite on an explicit scheme://authority match instead of
    # coalesce
    expr = (
        f"CASE WHEN regexp_matches({expr}, '^[A-Za-z][A-Za-z0-9+.-]*://')"
        f" THEN lower(regexp_extract({expr}, {auth}, 1)) || "
        f"regexp_extract({expr}, {auth}, 2) ELSE {expr} END"
    )
    for pat, repl in URL_RULES_POST_LOWER:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr


def blocklist_filter(ds, hosts_col: str, blocked_domains: list[str]):
    """Domain-blocklist filter with subdomain semantics: a page whose
    host equals a blocked domain OR ends with ``.<domain>`` is dropped.

    The blocklist broadcasts in the task closure (domain lists are
    small); matching is ``k`` vectorized ``ends_with``/``equal`` passes
    over the host column — no per-row Python, no shuffle.
    """
    def f(t: pa.Table) -> pa.Table:
        hosts = t[hosts_col]
        mask = None
        for d in blocked_domains:
            hit = pc.or_(pc.equal(hosts, d), pc.ends_with(hosts, "." + d))
            mask = hit if mask is None else pc.or_(mask, hit)
        if mask is None:
            return t
        # a null host matches no domain: keep the row (null would
        # otherwise propagate through invert() and silently drop it)
        return t.filter(pc.invert(pc.coalesce(mask, pa.scalar(False))))

    return ds.map_batches(f, batch_format="pyarrow")


def extract_links(ds, text_col: str = "text", carry_col: str = "doc_id",
                  out_col: str = "href"):
    """Outbound-link extraction: every ``href="…"`` value in a page's
    markup becomes one output row ``(carry_col, out_col)`` — the explode
    that feeds a host-level link graph (and from there PageRank-style
    crawl prioritization).

    Fully vectorized with no regex-all kernel needed: ONE
    ``split_pattern`` on the literal ``href="`` (the first fragment per
    page is pre-link text and is dropped by position), then ONE
    ``split_pattern`` on ``"`` taking element 0.  A fragment with no
    closing quote (truncated markup) is dropped, matching the semantics
    of the oracle's ``href="([^"]*)"`` regex.  Pure ``map_batches`` —
    zero shuffles; a page with no links emits no rows.
    """
    import numpy as np

    def f(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.coalesce(texts, pa.scalar("", texts.type))
        parts = pc.split_pattern(texts, 'href="')
        flat = pc.list_flatten(parts)
        par = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
        offs = parts.offsets.to_numpy(zero_copy_only=False)
        pos = np.arange(len(par)) - offs[par]
        keep = (pos > 0) & pc.match_substring(flat, '"').to_numpy(
            zero_copy_only=False)
        frag = flat.filter(pa.array(keep))
        carry = t[carry_col].take(pa.array(par[keep]))
        url = pc.list_element(pc.split_pattern(frag, '"'), 0)
        return pa.table({carry_col: carry, out_col: url})

    return ds.map_batches(f, batch_format="pyarrow")


def extract_anchors(ds, text_col: str = "text", carry_col: str = "doc_id"):
    """(href, anchor-text) pair extraction — the signal behind anchor-text
    retrieval indexes (inbound anchors describe the TARGET page better than
    its own words; classic web-IR feature).

    Matches exactly the pattern ``href="([^"]*)">([^<]*)</a>`` — i.e. the
    immediate form ``href="URL">TEXT</a>`` with no attributes between the
    quote and ``>`` and no markup inside the anchor text — and the oracle
    replays that regex verbatim.  Vectorized like :func:`extract_links`:
    ONE split on ``href="``, then per fragment a max-1 split on ``">``
    (valid iff the first ``"`` is immediately followed by ``>``) and a
    max-1 split on ``</a>`` (valid iff the anchor segment closes and holds
    no ``<``).  Pure ``map_batches``, zero shuffles.
    """
    import numpy as np

    def f(t: pa.Table) -> pa.Table:
        texts = t[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.coalesce(texts, pa.scalar("", texts.type))
        parts = pc.split_pattern(texts, 'href="')
        flat = pc.list_flatten(parts)
        par = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
        offs = parts.offsets.to_numpy(zero_copy_only=False)
        pos = np.arange(len(par)) - offs[par]
        k1 = (pos > 0) & pc.match_substring(flat, '">').to_numpy(
            zero_copy_only=False)
        frag, par = flat.filter(pa.array(k1)), par[k1]
        # url">rest — p2 always 2 elements after the k1 filter
        p2 = pc.split_pattern(frag, '">', max_splits=1)
        url, tail = pc.list_element(p2, 0), pc.list_element(p2, 1)
        k2 = (
            ~pc.match_substring(url, '"').to_numpy(zero_copy_only=False)
            & pc.match_substring(tail, "</a>").to_numpy(zero_copy_only=False)
        )
        url, par = url.filter(pa.array(k2)), par[k2]
        anchor = pc.list_element(
            pc.split_pattern(tail.filter(pa.array(k2)), "</a>",
                             max_splits=1), 0)
        k3 = pa.array(
            ~pc.match_substring(anchor, "<").to_numpy(zero_copy_only=False))
        return pa.table({
            carry_col: t[carry_col].take(
                pa.array(par[k3.to_numpy(zero_copy_only=False)])),
            "href": url.filter(k3),
            "anchor": anchor.filter(k3),
        })

    return ds.map_batches(f, batch_format="pyarrow")


def canonical_url_per_group(ds, group_col: str, url_col: str,
                            id_col: str = "doc_id",
                            num_partitions: int = 16):
    """Canonical-URL election inside duplicate groups.

    After exact/near dedup, every cluster of identical pages still needs
    ONE representative URL to keep — crawlers elect it by URL quality,
    not arbitrarily: prefer https over http, then the shortest URL, then
    lexicographic, then smallest id (each later rule only breaks ties in
    the earlier ones, so the winner is total-order deterministic).

    One ``group_col``-keyed exchange — each group lands whole in one
    partition — then a single vectorized pandas pass elects every
    group's winner at once (sort by the rule tuple + head(1) per group;
    per-group dispatch would not scale to web cluster counts).  Output:
    one row per group with the winning URL/id and the group size.
    """
    import pandas as pd

    from dedup_ray.util.dsutil import partitioned_group_apply

    def elect(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(
            _https=(~df[url_col].str.startswith("https://")).astype("int64"),
            _len=df[url_col].str.len().astype("int64"),
        )
        df = df.sort_values([group_col, "_https", "_len", url_col, id_col])
        g = df.groupby(group_col, sort=False)
        win = g.head(1)[[group_col, url_col, id_col]].rename(
            columns={url_col: "canonical_url", id_col: "canonical_id"})
        sizes = g.size().rename("n_pages").reset_index()
        out = win.merge(sizes, on=group_col)
        out["n_pages"] = out["n_pages"].astype("int64")
        return out

    return partitioned_group_apply(ds, [group_col], elect,
                                   num_partitions=num_partitions)


# Embedded mini public-suffix list (the PSL pattern at spec scale: rules
# ordered longest-first, matched against the host tail).  The SAME list
# drives the vectorized kernel and the generated SQL oracle, so adding a
# rule updates both engines at once.
PUBLIC_SUFFIXES = sorted(
    ["co.uk", "ac.uk", "com.au", "co.jp", "com", "org", "net",
     "io", "uk", "au", "jp"],
    key=len, reverse=True,
)


def registrable_domain_array(hosts) -> "pa.Array":
    """Vectorized host → registrable domain (label + matched suffix).

    Longest matching public suffix wins; a host with no matching rule
    (or equal to a bare suffix) maps to itself.  One pandas str pass
    per rule over the whole column — no Python per-row loop.
    """
    import pandas as pd

    h = pd.Series(hosts.to_pandas() if hasattr(hosts, "to_pandas")
                  else hosts, dtype="object").fillna("")
    out = h.copy()
    done = pd.Series(False, index=h.index)
    for suf in PUBLIC_SUFFIXES:
        hit = ~done & h.str.endswith("." + suf)
        if hit.any():
            prefix = h[hit].str.slice(0, -(len(suf) + 1))
            label = prefix.str.rpartition(".")[2]
            out[hit] = label + "." + suf
            done |= hit
        done |= ~done & (h == suf)  # bare suffix: maps to itself
    return pa.array(out.astype(str), pa.string())


def registrable_domain(ds, host_col: str = "host", out_col: str = "domain"):
    """Append the registrable domain of ``host_col`` (PSL longest-match).

    The grouping key real crawl policies cap/aggregate on — per-HOST
    caps undercount sites spanning subdomains; the registrable domain
    is the ownership boundary.  Batch-local, no shuffle.
    """
    def f(t: pa.Table) -> pa.Table:
        return t.append_column(out_col,
                               registrable_domain_array(t[host_col]))

    return ds.map_batches(f, batch_format="pyarrow")


def registrable_domain_sql(col: str) -> str:
    """Nested-CASE SQL replaying PUBLIC_SUFFIXES longest-first: the
    label before the matched suffix via an RE2-safe regexp_extract."""
    expr = col  # fallback: no rule matches -> host itself
    for suf in reversed(PUBLIC_SUFFIXES):  # build innermost = longest last
        suf_re = suf.replace(".", "\\.")
        expr = (f"CASE WHEN {col} LIKE '%.{suf}' THEN "
                f"regexp_extract({col}, '([^.]+\\.{suf_re})$', 1) "
                f"ELSE {expr} END")
    # reversed() above nests so the LONGEST suffix is the outermost test
    return expr


# --------------------------------------------------------------------------
# URL path templating — the crawl-trap / infinite-space detector
# --------------------------------------------------------------------------

# Ordered rewrite chain (RE2, applied 'g', hex before digits so id hashes
# don't degrade into digit-runs); shared VERBATIM with the generated SQL
# twin, so kernel and oracle cannot drift.
PATH_TEMPLATE_RULES: list[tuple[str, str]] = [
    (r"[0-9a-f]{8,}", "(hex)"),   # long hex ids: session keys, uuids, hashes
    (r"[0-9]+", "(n)"),           # numeric ids, page numbers, dates
]


def path_template_array(urls: pa.Array) -> pa.Array:
    """URL → templated path: strip scheme://authority, then apply the
    rewrite chain.  ``/item/8283/v?sid=deadbeef01`` → ``/item/(n)/v?sid=(hex)``."""
    path = pc.replace_substring_regex(
        urls, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "", max_replacements=1
    )
    for pat, repl in PATH_TEMPLATE_RULES:
        path = pc.replace_substring_regex(path, pat, repl)
    return path


def path_template_sql(col: str) -> str:
    """DuckDB expression twin of :func:`path_template_array`."""
    expr = f"regexp_replace({col}, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '')"
    for pat, repl in PATH_TEMPLATE_RULES:
        expr = f"regexp_replace({expr}, '{pat}', '{repl}', 'g')"
    return expr


def path_template_census(ds, url_col: str = "url", min_pages: int = 2,
                         num_partitions: int = 8):
    """Crawl-trap census: count pages per ``(host, path template)`` and
    keep templates serving ≥ ``min_pages`` pages — the standard detector
    for infinite URL spaces (calendars, session ids, faceted search,
    ?page=N chains) that a frontier must cap.  A healthy host has many
    templates with small counts; a trap is one template with a huge
    count (pair this with ``cap_per_host_docs`` as the enforcement).

    One vectorized rewrite pass (host extraction + the template chain
    are RE2 kernels over the Arrow string column) and per-batch partial
    counts, then ONE narrow grouped sum over ``(host, template)`` rows —
    group cardinality is bounded by the site-structure count, not the
    page count, so the shuffle is tiny at any corpus size.

    Output: ``(host, template, n_pages)`` with ``n_pages ≥ min_pages``.
    """

    def partial(t: pa.Table) -> pa.Table:
        urls = t[url_col]
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        host = extract_host_array(urls)
        tpl = path_template_array(urls)
        g = pa.table({"host": host, "template": tpl}).group_by(
            ["host", "template"]).aggregate([([], "count_all")])
        return g.rename_columns(["host", "template", "n"])

    parts = ds.map_batches(partial, batch_format="pyarrow")
    summed = parts.groupby(["host", "template"]).sum("n")

    def finish(t: pa.Table) -> pa.Table:
        n = t["sum(n)"] if "sum(n)" in t.column_names else t["n"]
        out = pa.table({
            "host": t["host"],
            "template": t["template"],
            "n_pages": pc.cast(n, pa.int64()),
        })
        return out.filter(pc.greater_equal(out["n_pages"],
                                           pa.scalar(min_pages)))

    return summed.map_batches(finish, batch_format="pyarrow")


def frontier_schedule(ds, host_col: str = "host", id_col: str = "url_id",
                      delay_col: str = "delay_ms",
                      num_partitions: int = 8):
    """Politeness-aware crawl-frontier scheduling: within each host the
    pages are fetched one per ``delay_ms`` (the robots.txt crawl-delay
    contract), so page ``i`` of a host in deterministic ``id_col`` order
    gets ``seq = i`` and ``fetch_at_ms = i · delay_ms``.  Hosts schedule
    independently — the frontier interleaves across hosts for free — so
    ONE host-keyed exchange settles every slot with no global state;
    at 10^12 URLs the per-partition work is a sort of that partition's
    rows, and no host's queue ever leaves its partition (skew bound =
    largest single host, the same bound the fetch itself has).

    Output: ``(id_col, host_col, seq, fetch_at_ms)``.
    """
    import numpy as np

    from dedup_ray.util.exchange import exchange_group_apply

    def schedule(part: pa.Table) -> pa.Table:
        empty = pa.table({
            id_col: pa.array([], pa.int64()),
            host_col: pa.array([], pa.string()),
            "seq": pa.array([], pa.int64()),
            "fetch_at_ms": pa.array([], pa.int64()),
        })
        if part.num_rows == 0 or host_col not in part.column_names:
            return empty
        df = part.select([id_col, host_col, delay_col]).to_pandas()
        df = df.sort_values([host_col, id_col], kind="stable")
        seq = df.groupby(host_col, sort=False).cumcount().to_numpy()
        return pa.table({
            id_col: pa.array(df[id_col].to_numpy(), part[id_col].type),
            host_col: pa.array(df[host_col].to_numpy(),
                               part[host_col].type),
            "seq": pa.array(seq, pa.int64()),
            "fetch_at_ms": pa.array(
                seq * df[delay_col].to_numpy(dtype=np.int64), pa.int64()),
        })

    return exchange_group_apply(ds, host_col, schedule, num_partitions)
