"""Property-based tests (hypothesis) for the final-session kernels:
the PSL registered-domain algorithm and the DUST pair-diff rule."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from louis_crawler_legacy_ray.functions.urls import registered_domain
from louis_crawler_legacy_ray.stages.dedup import _dust_rule

label = st.text(alphabet=string.ascii_lowercase + string.digits, min_size=1, max_size=8)


@settings(max_examples=200, deadline=None)
@given(st.lists(label, min_size=1, max_size=5),
       st.sampled_from(["com", "co.uk", "on.ca", "github.io", "zz"]))
def test_registered_domain_properties(labels, suffix):
    host = ".".join(labels + [*suffix.split(".")])
    rd = registered_domain(host)
    if rd is not None:
        # output is a dot-suffix of the input
        assert host == rd or host.endswith("." + rd)
        # eTLD+1 has exactly one label more than the matched suffix
        assert rd.endswith(suffix)
        assert len(rd.split(".")) == len(suffix.split(".")) + 1
        # idempotence: the registered domain is its own registered domain
        assert registered_domain(rd) == rd
    else:
        # only when the host IS a public suffix
        assert host == suffix


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abcxy/?=.", max_size=24),
       st.text(alphabet="abcxy/?=.", max_size=24))
def test_dust_rule_reconstructs_pair(a, b):
    fr, to = _dust_rule(a, b)
    # determine which input the 'from' side came from (longer, ties lex)
    hi, lo = (a, b) if (len(a), a) >= (len(b), b) else (b, a)
    # the common prefix/suffix split must reconstruct both inputs
    p = (len(hi) - len(fr)) if fr else None
    # reconstruct via the definition: hi = P + fr + S, lo = P + to + S
    # find P as the longest common prefix bounded by the shorter middle
    n = 0
    while n < len(lo) and hi[n] == lo[n]:
        n += 1
    s = 0
    while s < len(lo) - n and hi[len(hi) - 1 - s] == lo[len(lo) - 1 - s]:
        s += 1
    assert hi == hi[:n] + fr + (hi[len(hi) - s :] if s else "")
    assert lo == lo[:n] + to + (lo[len(lo) - s :] if s else "")
    # applying the rule to hi yields lo
    assert lo == hi[:n] + to + (hi[len(hi) - s :] if s else "")
