"""Differential fuzz: the regex -> byte-DFA compiler vs Python `re`.

Guided decoding constrains production output with these tables
(karanta_tpu/inference/guided.py); a wrong DFA silently corrupts every
guided generation. For seeded random regexes over the supported grammar,
`match_full` must agree with `re.fullmatch` (bytes mode — the DFA is
byte-level and the class escapes are ASCII) in BOTH directions:

- random byte strings (mostly negative cases)
- strings sampled by walking the compiled DFA to an accepting state
  (positive cases — catches false-accepts Python rejects)
"""

import random
import re

import numpy as np
import pytest

from karanta_tpu.inference.guided import compile_regex, match_full

LITERALS = "abc01"
CLASSES = ["[abc]", "[^a]", "[a-c]", "[0-9a-b]", r"[\d]", r"[\w]"]
ESCAPES = [r"\d", r"\w", r"\s", r"\D"]


def _gen_regex(rng: random.Random, depth: int = 0) -> str:
    def atom():
        roll = rng.random()
        if roll < 0.45 or depth >= 3:
            return rng.choice(LITERALS)
        if roll < 0.6:
            return rng.choice(CLASSES)
        if roll < 0.7:
            return rng.choice(ESCAPES)
        if roll < 0.78:
            return "."
        return "(" + _gen_regex(rng, depth + 1) + ")"

    def repeat():
        a = atom()
        roll = rng.random()
        if roll < 0.55:
            return a
        if roll < 0.65:
            return a + "*"
        if roll < 0.75:
            return a + "+"
        if roll < 0.85:
            return a + "?"
        m = rng.randint(0, 2)
        n = rng.randint(m, m + 2)
        return a + rng.choice([f"{{{m}}}", f"{{{m},{n}}}", f"{{{m},}}"])

    concat = "".join(repeat() for _ in range(rng.randint(1, 4)))
    if depth < 2 and rng.random() < 0.3:
        return concat + "|" + _gen_regex(rng, depth + 1)
    return concat


def _sample_accepting(dfa, rng: random.Random, max_len: int = 16):
    """Random walk to an accepting state; None if the walk dead-ends."""
    out = []
    state = dfa.start
    for _ in range(max_len):
        if dfa.accepting[state] and rng.random() < 0.4:
            return bytes(out)
        choices = np.flatnonzero(dfa.table[state] != dfa.dead)
        if len(choices) == 0:
            break
        byte = int(rng.choice(list(choices)))
        out.append(byte)
        state = int(dfa.table[state, byte])
    return bytes(out) if dfa.accepting[state] else None


@pytest.mark.parametrize("seed", range(60))
def test_random_regexes_agree_with_re(seed):
    rng = random.Random(seed)
    pattern = _gen_regex(rng)
    try:
        dfa = compile_regex(pattern)
    except ValueError:
        return  # DFA blow-up guard is allowed to refuse; not a bug
    py = re.compile(pattern.encode())

    alphabet = b"abc01 x\n-"
    for _ in range(60):
        n = rng.randint(0, 10)
        s = bytes(rng.choice(alphabet) for _ in range(n))
        assert match_full(dfa, s) == bool(py.fullmatch(s)), (
            f"pattern={pattern!r} input={s!r}")

    for _ in range(20):
        s = _sample_accepting(dfa, rng)
        if s is None:
            continue
        assert py.fullmatch(s), (
            f"DFA accepts {s!r} but re rejects it (pattern={pattern!r})")


@pytest.mark.parametrize("pattern", [
    "(a*)*b", "(a|)b", "a{0,0}b", "(|a)", "((a|b)|c)+", "a||b",
    "[]a]", "[a-]", "(?:ab)+c", "a{2,}{1}",
])
def test_edge_patterns_match_or_raise_cleanly(pattern):
    """Tricky corners either agree with `re` or raise ValueError — never
    crash or silently diverge."""
    try:
        dfa = compile_regex(pattern)
    except ValueError:
        return
    try:
        py = re.compile(pattern.encode())
    except re.error:
        return  # we accept a superset re rejects; nothing to compare
    rng = random.Random(0)
    for _ in range(80):
        n = rng.randint(0, 6)
        s = bytes(rng.choice(b"ab]c-") for _ in range(n))
        assert match_full(dfa, s) == bool(py.fullmatch(s)), (
            f"pattern={pattern!r} input={s!r}")
