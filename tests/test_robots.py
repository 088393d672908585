"""RFC 9309 robots evaluation: parser group selection, longest-match
precedence, wildcard/$ patterns, and the distributed cogroup filter."""

import numpy as np
import pyarrow as pa

import ray.data as rd

from dedup_ray.stages.robots import (
    evaluate_rules,
    parse_robots,
    robots_filter,
)


def _allowed(rules, path):
    return bool(evaluate_rules(rules, np.array([path], dtype=object))[0])


def test_parser_group_selection():
    txt = (
        "# comment\n"
        "User-agent: googlebot\n"
        "Disallow: /g\n"
        "\n"
        "User-agent: *\n"
        "Disallow: /all\n"
        "Allow: /all/ok\n"
    )
    assert parse_robots(txt, "googlebot") == [(False, "/g")]
    assert parse_robots(txt, "otherbot") == [(False, "/all"),
                                             (True, "/all/ok")]
    # consecutive user-agent lines share a group
    txt2 = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    assert parse_robots(txt2, "b") == [(False, "/x")]
    # a blank line does NOT close a group: consecutive user-agent lines
    # (even separated by blanks) share the following rules (RFC 9309)
    txt3 = "User-agent: me\n\nUser-agent: *\nDisallow: /\n"
    assert parse_robots(txt3, "me") == [(False, "/")]
    # a matching group with no rules allows everything (no * fallback);
    # the empty Allow closes the agent run without adding a rule
    txt4 = "User-agent: me\nAllow:\n\nUser-agent: *\nDisallow: /\n"
    assert parse_robots(txt4, "me") == []
    assert parse_robots(txt4, "other") == [(False, "/")]
    # empty Disallow value constrains nothing
    assert parse_robots("User-agent: *\nDisallow:\n") == []


def test_longest_match_and_allow_tie():
    rules = [(False, "/"), (True, "/public")]
    assert not _allowed(rules, "/private/x")
    assert _allowed(rules, "/public/page")
    # equal-length Allow and Disallow: Allow wins (RFC 9309 2.2.2)
    tie = [(True, "/page"), (False, "/page")]
    assert _allowed(tie, "/page")
    # no rules / no match -> allowed
    assert _allowed([], "/anything")
    assert _allowed([(False, "/x")], "/y")


def test_wildcard_and_anchor_patterns():
    # * spans any octets; $ anchors the end (RFC 9309 2.2.3 examples)
    rules = [(False, "/*.gif$")]
    assert not _allowed(rules, "/pics/cat.gif")
    assert _allowed(rules, "/pics/cat.gif?v=2")   # $ means END
    assert _allowed(rules, "/pics/cat.jpg")
    rules2 = [(False, "/fish*.php")]
    assert not _allowed(rules2, "/fishheads/catfish.php?x=1")
    assert _allowed(rules2, "/fish.html")
    # regex metacharacters in paths are literal
    rules3 = [(False, "/a.b")]
    assert not _allowed(rules3, "/a.b/c")
    assert _allowed(rules3, "/aXb")


def test_robots_filter_dataset_missing_host_allows():
    urls = rd.from_arrow(pa.table({"url": pa.array([
        "http://a.com/private/1",
        "http://a.com/public/1",
        "http://b.com/anything",
        "http://A.COM/private/2",   # host matching is case-insensitive
        "http://c.com",             # empty path -> "/"
    ])}))
    robots = rd.from_arrow(pa.table({
        "host": pa.array(["a.com", "c.com"]),
        "robots_txt": pa.array([
            "User-agent: *\nDisallow: /private\nAllow: /public\n",
            "User-agent: *\nDisallow: /\n",
        ]),
    }))
    out = robots_filter(urls, robots, num_partitions=2).to_pandas()
    got = dict(zip(out["url"], out["allowed"]))
    assert got["http://a.com/private/1"] == False
    assert got["http://a.com/public/1"] == True
    assert got["http://b.com/anything"] == True
    assert got["http://A.COM/private/2"] == False
    assert got["http://c.com"] == False
