"""Regex→DFA compiler (stages/redfa.py): language equality vs Python re,
viability pruning vs brute force, suffix slicing."""

import re

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from scylla_cdc_source_connector_ray.stages.redfa import SymbolDFA, slice_strings

PATTERNS = [
    "ut+a",
    "u(t|a)*s",
    "a{2,4}",
    "[^u]t",
    "u.a",
    "(ua|ut)+",
    "t{3}",
    "[a-c]x?",
    "us{0,2}a",
    "u(ta)+|at",
]


@settings(max_examples=150, deadline=None)
@given(st.sampled_from(PATTERNS), st.text(alphabet="uatsdx", max_size=14))
def test_dfa_language_matches_python_re(pattern, s):
    d = SymbolDFA.compile(pattern)
    assert bool(d.accept[d.run(s)]) == bool(re.fullmatch(pattern, s))


@settings(max_examples=150, deadline=None)
@given(st.sampled_from(PATTERNS), st.lists(st.text(alphabet="uatsdx", max_size=10), max_size=8))
def test_earliest_viable_matches_bruteforce(pattern, tails):
    d = SymbolDFA.compile(pattern)
    cre = re.compile(pattern)
    tails = [t for t in tails if not cre.search(t)]  # carries are match-free
    got = d.earliest_viable_starts(pa.array(tails, pa.string()))
    for t, g in zip(tails, got):
        brute = len(t)
        for q in range(len(t)):
            if d.live[d.run(t[q:])]:
                brute = q
                break
        assert g == brute, (pattern, t)


def test_viability_prunes_dead_keeps_live():
    d = SymbolDFA.compile("ut+a")
    v = d.earliest_viable_starts(pa.array(["ssss", "ssut", "u", "", "tu", "utt"]))
    # 'ssss' all dead -> 4; 'ssut' viable from the 'u' at 2; 'tu' from 1
    assert v.tolist() == [4, 2, 0, 0, 1, 0]


def test_compile_rejections():
    with pytest.raises(ValueError, match="empty string"):
        SymbolDFA.compile("a*")
    with pytest.raises(ValueError):
        SymbolDFA.compile("(ua")
    with pytest.raises(ValueError):
        SymbolDFA.compile("u{3,1}")


def test_slice_strings_offsets_and_types():
    arr = pa.array(["hello", "", "abc", "xy"])
    assert slice_strings(arr, np.array([2, 0, 3, 1])).to_pylist() == ["llo", "", "", "y"]
    big = pa.array(["hello", "abc"], pa.large_string())
    assert slice_strings(big, np.array([1, 2])).to_pylist() == ["ello", "c"]
    sliced = pa.array(["aaa", "bbb", "ccc"]).slice(1)
    assert slice_strings(sliced, np.array([1, 0])).to_pylist() == ["bb", "ccc"]
    # past the int32-offset capacity the output must promote to
    # large_string instead of silently wrapping offsets (cap lowered to
    # make the branch testable)
    big_out = slice_strings(arr, np.array([0, 0, 0, 0]), i32_cap=4)
    assert pa.types.is_large_string(big_out.type)
    assert big_out.to_pylist() == ["hello", "", "abc", "xy"]
