"""functions/robots.py — RFC 9309 matcher kernels: wildcard/anchor
pattern matching, group selection by product token, longest-match
precedence with the Allow tie-break, and the RobotsCache mode switch
(stdlib robotparser treats '*' as a literal, rfc9309 must not)."""

from louis_crawler_legacy_ray.functions.robots import (
    Rfc9309Matcher,
    parse_groups,
    pattern_match,
)
from louis_crawler_legacy_ray.state.politeness import RobotsCache


def test_pattern_match_wildcards_and_anchor():
    assert pattern_match("/fish", "/fishheads")           # prefix
    assert not pattern_match("/fish", "/catfish")
    assert pattern_match("/*.php", "/index.php")          # mid wildcard
    assert pattern_match("/*.php", "/folder/any.php.file")
    assert pattern_match("/*.php$", "/folder/filename.php")
    assert not pattern_match("/*.php$", "/filename.php5")  # anchor binds
    assert pattern_match("/fish*.php", "/fishheads/catfish.php?x"[:22])
    assert pattern_match("/a*b*c", "/a-x-b-y-c-z")        # multi-star
    assert not pattern_match("/a*b*c$", "/a-x-b-y-c-z")
    assert pattern_match("/a*b*c$", "/a-x-b-y-c")
    assert pattern_match("/x*$", "/x/anything")           # trailing star


def test_group_selection_by_product_token():
    txt = (
        "User-agent: otherbot\nDisallow: /\n\n"
        "User-agent: Louis\nDisallow: /private/\n\n"
        "User-agent: *\nDisallow: /everything/\n"
    )
    # token match (case-insensitive) beats the * group entirely
    assert parse_groups(txt, "louis") == [("disallow", "/private/")]
    # unknown token falls back to *
    assert parse_groups(txt, "nobody") == [("disallow", "/everything/")]
    # a group addressed to us whose only rule is the empty Disallow
    # (allow-all stanza) still governs — no fallback to *
    txt2 = "User-agent: louis\nDisallow:\n\nUser-agent: *\nDisallow: /\n"
    assert parse_groups(txt2, "louis") == []
    m = Rfc9309Matcher(txt2, "louis")
    assert m.allowed("/anything")


def test_longest_match_and_allow_tie():
    txt = (
        "User-agent: louis\n"
        "Disallow: /p/\n"
        "Allow: /p/open\n"
        "Disallow: /q/\n"
        "Allow: /q/\n"       # equal length: Allow must win
    )
    m = Rfc9309Matcher(txt, "louis")
    assert not m.allowed("/p/secret")
    assert m.allowed("/p/open/deep")   # longer Allow re-opens
    assert m.allowed("/q/tie")         # tie -> Allow
    assert m.allowed("/unmatched")     # no rule -> allowed


def test_robots_cache_matcher_modes():
    txt = "User-agent: *\nDisallow: /*.pdf$\n"
    by_host = {"a.ca": txt}
    rfc = RobotsCache(by_host, obey_robots=True, matcher="rfc9309")
    assert not rfc.allowed("http://a.ca/files/report.pdf")
    assert rfc.allowed("http://a.ca/files/report.pdfx")  # anchor binds
    assert rfc.allowed("http://b.ca/anything")           # no robots -> allowed
    # default stdlib mode keeps its historical literal-'*' behavior —
    # the mode switch exists precisely because these disagree
    std = RobotsCache(by_host, obey_robots=True)
    assert std.allowed("http://a.ca/files/report.pdf")


def test_canonicalize_url_kernel():
    """functions/urls.canonicalize_url — the RFC 3986 §6 edge cases
    the oracle fixture can't plant (non-default port kept, trailing
    dot-segment keeps the directory slash, unreserved %XX decodes,
    blank query values survive the sort)."""
    from louis_crawler_legacy_ray.functions.urls import canonicalize_url as c

    assert c("HTTP://A.CA:80/x") == "http://a.ca/x"
    assert c("https://a.ca:443/x") == "https://a.ca/x"
    assert c("http://a.ca:8080/x") == "http://a.ca:8080/x"  # kept
    assert c("http://a.ca") == "http://a.ca/"
    assert c("http://a.ca/a/b/..") == "http://a.ca/a/"
    assert c("http://a.ca/a/./") == "http://a.ca/a/"
    assert c("http://a.ca/%64oc/%7Euser") == "http://a.ca/doc/~user"
    assert c("http://a.ca/p?b=2&a=1&a=") == "http://a.ca/p?a=&a=1&b=2"
    assert c("http://a.ca/p#frag") == "http://a.ca/p"
