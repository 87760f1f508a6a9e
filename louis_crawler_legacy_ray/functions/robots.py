"""RFC 9309 (Robots Exclusion Protocol) matcher: ``*`` / ``$``
wildcards, longest-pattern-wins precedence, Allow beating Disallow on
ties — the semantics Googlebot and every major crawler implement, and
which the stdlib ``urllib.robotparser`` the default RobotsCache mode
wraps does NOT (it treats ``*`` as a literal octet).

Pure string kernels, no regex: a robots pattern is a '*'-separated
substring sequence with an optional '$' end anchor, so greedy
first-find matching is exact (no backtracking needed for unbounded
wildcards). Reference parity note: the reference obeys no robots at
all (settings.py:19); this module is the standards-true OPT-IN layer
over it, selected by RobotsCache(matcher="rfc9309")."""

from __future__ import annotations


def pattern_match(pattern: str, path: str) -> bool:
    """Does ``pattern`` (RFC 9309 ``Allow``/``Disallow`` value) match
    ``path``? '*' matches any run of octets (slashes included), '$'
    anchors the end; otherwise the match is a prefix match."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    parts = pattern.split("*")
    if len(parts) == 1:
        return path == pattern if anchored else path.startswith(pattern)
    if not path.startswith(parts[0]):
        return False
    pos = len(parts[0])
    for seg in parts[1:-1]:
        if not seg:
            continue
        i = path.find(seg, pos)
        if i < 0:
            return False
        pos = i + len(seg)
    last = parts[-1]
    if anchored:
        return path.endswith(last) and len(path) - len(last) >= pos
    return path.find(last, pos) >= 0


def parse_groups(
    robots_txt: str, product_token: str
) -> list[tuple[str, str]]:
    """Extract the (directive, pattern) rules that apply to
    ``product_token`` per RFC 9309 group selection: every group whose
    ``User-agent`` equals the token (case-insensitive) merges; if none
    match, the ``*`` groups apply; a crawler never obeys both. Empty
    patterns are dropped (an empty Disallow matches nothing — the
    classic allow-all stanza)."""
    token = product_token.lower()
    exact: list[tuple[str, str]] = []
    star: list[tuple[str, str]] = []
    saw_exact_group = False
    # state machine over lines: consecutive User-agent lines stack
    # onto the rule block that follows (RFC 9309 §2.1 group grammar)
    agents: list[str] = []
    in_rules = False
    for raw in robots_txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_rules:
                agents = []
                in_rules = False
            agents.append(value.lower())
            continue
        if field in ("allow", "disallow"):
            in_rules = True
            if token in agents:
                saw_exact_group = True
                if value:
                    exact.append((field, value))
            elif "*" in agents and value:
                star.append((field, value))
        # other fields (crawl-delay, sitemap) end nothing: RFC allows
        # them inside groups; they're handled by RobotsCache/stdlib
    # a group ADDRESSED to us governs even if all its rules were empty
    # (the allow-all stanza) — falling back to * then would be wrong
    return exact if saw_exact_group else star


class Rfc9309Matcher:
    """One host's compiled rule group. ``allowed(path)`` applies the
    RFC precedence: among matching rules take the one with the most
    octets in its pattern; on a tie Allow wins; no match => allowed."""

    __slots__ = ("rules",)

    def __init__(self, robots_txt: str, product_token: str):
        # sort once by (len desc, allow-first) so the first match in
        # order IS the verdict — no per-path ranking
        rs = parse_groups(robots_txt, product_token)
        self.rules = sorted(
            rs, key=lambda r: (-len(r[1]), r[0] != "allow")
        )

    def allowed(self, path: str) -> bool:
        for directive, pattern in self.rules:
            if pattern_match(pattern, path):
                return directive == "allow"
        return True
