"""robots.txt evaluation (RFC 9309, the Robots Exclusion Protocol) — the
crawl-politeness gate in front of every fetch pipeline.

Written from the published RFC: records group under ``User-agent`` lines;
the group whose agent token best matches the product token applies (exact
token beats ``*``; an agent with NO matching group may crawl everything).
``Allow``/``Disallow`` values are path patterns where ``*`` matches any
octet sequence and ``$`` anchors the end; the rule with the LONGEST
pattern (octets) wins, Allow winning length ties.  An empty ``Disallow:``
value means no restriction.

Distributed shape: robots payloads are per-HOST state, so the operator is
ONE cogroup exchange of the URL stream against the robots table keyed on
host — each partition compiles a host's rule list once and sweeps that
host's paths rule-by-rule (rules are few, paths are many; the inner match
is one vectorized regex per rule).  Hosts with no robots row allow all.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def parse_robots(text: str, agent: str = "*") -> list[tuple[bool, str]]:
    """robots.txt → ordered [(is_allow, path_pattern)] for ``agent``.

    Group selection per RFC 9309 §2.2.1: collect rules of every group
    whose user-agent token equals ``agent`` (case-insensitive); if none
    match, fall back to the ``*`` groups.  Consecutive ``User-agent``
    lines share one group.  Unknown directives are ignored.
    """
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    agents: list[str] = []
    rules: list[tuple[bool, str]] = []
    saw_rule = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            if saw_rule:  # a rule line closes the agent run
                groups.append((agents, rules))
                agents, rules, saw_rule = [], [], False
            agents.append(val.lower())
        elif key in ("allow", "disallow"):
            saw_rule = True
            if val:  # an empty value constrains nothing (RFC 9309 §2.2.2)
                rules.append((key == "allow", val))
    if agents or rules:
        groups.append((agents, rules))
    agent = agent.lower()
    exact = [r for a, rs in groups for r in rs if agent in a]
    if exact or any(agent in a for a, _ in groups):
        return exact
    return [r for a, rs in groups for r in rs if "*" in a]


def _pattern_regex(pattern: str) -> str:
    """RFC 9309 path pattern → anchored RE2 (* = any run, $ = end)."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    parts = [re.escape(p) for p in body.split("*")]
    return "^" + ".*".join(parts) + ("$" if anchored else "")


def evaluate_rules(rules: list[tuple[bool, str]],
                   paths: np.ndarray) -> np.ndarray:
    """Vectorized longest-match-wins over one host's paths.

    Per rule ONE regex sweep over the path array; the winning rule per
    path maximizes (pattern octet length, is_allow) — Allow wins length
    ties per RFC 9309 §2.2.2.  No matching rule → allowed.
    """
    n = len(paths)
    best_len = np.full(n, -1, np.int64)
    best_allow = np.ones(n, bool)
    if not rules or n == 0:
        return best_allow
    arr = pa.array(paths, pa.string())
    for is_allow, pattern in rules:
        hit = pc.match_substring_regex(
            arr, _pattern_regex(pattern)).to_numpy(zero_copy_only=False)
        plen = len(pattern.encode())
        better = hit & (
            (plen > best_len) | ((plen == best_len) & is_allow)
        )
        best_len[better] = plen
        best_allow[better] = is_allow
    return best_allow


def robots_filter(urls_ds, robots_ds, agent: str = "*",
                  url_col: str = "url", host_col: str = "host",
                  robots_col: str = "robots_txt",
                  num_partitions: int = 16):
    """Append ``allowed`` to the URL stream by evaluating each host's
    robots.txt — one cogroup exchange on the host, rules compiled once
    per host per partition.  ``urls_ds`` needs (url); ``robots_ds``
    needs (host, robots_txt).  Hosts without robots allow everything.
    """
    from dedup_ray.ops.relational import cogroup
    from dedup_ray.stages.urlnorm import extract_host_array

    def with_host(t: pa.Table) -> pa.Table:
        u = t[url_col]
        if isinstance(u, pa.ChunkedArray):
            u = u.combine_chunks()
        host = extract_host_array(u)
        path = pc.replace_substring_regex(
            u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/]*", "")
        path = pc.if_else(pc.equal(path, ""), pa.scalar("/"), path)
        return pa.table({url_col: t[url_col], host_col: host,
                         "path": path})

    urls = urls_ds.map_batches(with_host, batch_format="pyarrow")

    def per_part(u: pa.Table, r: pa.Table) -> pa.Table:
        if u.num_rows == 0 or url_col not in u.column_names:
            return pa.table({url_col: pa.array([], pa.string()),
                             "allowed": pa.array([], pa.bool_())})
        paths = np.asarray(u["path"].to_pylist(), dtype=object)
        hosts = np.asarray(u[host_col].to_pylist(), dtype=object)
        allowed = np.ones(len(paths), bool)
        if r.num_rows and host_col in r.column_names:
            rh = r[host_col].to_pylist()
            rt = r[robots_col].to_pylist()
            rules_by_host = {h: parse_robots(t or "", agent)
                             for h, t in zip(rh, rt)}
            for h, rules in rules_by_host.items():
                m = hosts == h
                if m.any():
                    allowed[m] = evaluate_rules(rules, paths[m])
        return pa.table({
            url_col: u[url_col],
            "allowed": pa.array(allowed, pa.bool_()),
        })

    return cogroup(
        [urls, robots_ds], [host_col, host_col], per_part,
        num_partitions,
        empty_schemas=[
            pa.schema([(url_col, pa.string()), (host_col, pa.string()),
                       ("path", pa.string())]),
            pa.schema([(host_col, pa.string()),
                       (robots_col, pa.string())]),
        ],
    )
