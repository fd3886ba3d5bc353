"""Regex → DFA compiler for the streaming CEP carry.

The streaming CEP runner carries, per key, the unconsumed symbol suffix
(everything after the last consumed match). For a LITERAL pattern that
suffix is bounded by ``len(literal) - 1``; for a general regex it is not —
but most of it is provably useless: a position that cannot start a match
extending past the end of the suffix can never participate in a future
match. This module compiles the (small-alphabet) symbol regex to a DFA and
computes, vectorized across all keys, the EARLIEST position in each carried
tail from which the run stays *live* (an accepting state is still reachable)
— everything before it is pruned.

Pruning soundness only needs language-level reachability, which is
engine-agnostic: RE2's leftmost-greedy priority affects WHICH match is
consumed, not which positions could ever start one. The match counting
itself is done by RE2 (``pc.replace_substring_regex`` with a sentinel), so
the engine semantics are RE2's by construction; the DFA never decides a
match.

Supported syntax (the symbol-pattern subset): literals, ``.``, ``[...]``
classes with ranges and ``^`` negation, ``(...)`` grouping, ``|``,
``* + ?``, ``{m} {m,} {m,n}``, and ``\\c`` escapes. Patterns are over
1-byte symbols (the CEP alphabet); anything fancier should be pre-mapped to
symbols upstream.

Public-literature anchors: Thompson construction (CACM 1968), subset
construction, and the right-to-left transition-function composition used by
parallel regex scanners (e.g. Mytkowicz et al., ASPLOS'14 "Data-parallel
finite-state machines"); no reference-connector analogue (the connector has
no CEP surface).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# parser → AST
# ---------------------------------------------------------------------------
# AST node tags: ("char", frozenset_of_chars, negated) | ("any",)
#                ("cat", a, b) | ("alt", a, b)
#                ("rep", a, min, max_or_None)

_POSTFIX = {"*": (0, None), "+": (1, None), "?": (0, 1)}


class _Parser:
    def __init__(self, pattern: str):
        self.p = pattern
        self.i = 0

    def peek(self) -> str | None:
        return self.p[self.i] if self.i < len(self.p) else None

    def take(self) -> str:
        c = self.p[self.i]
        self.i += 1
        return c

    def parse(self):
        node = self._alt()
        if self.i != len(self.p):
            raise ValueError(f"unexpected {self.p[self.i]!r} at {self.i} in {self.p!r}")
        return node

    def _alt(self):
        node = self._cat()
        while self.peek() == "|":
            self.take()
            node = ("alt", node, self._cat())
        return node

    def _cat(self):
        parts = []
        while self.peek() not in (None, "|", ")"):
            parts.append(self._rep())
        if not parts:
            raise ValueError(f"empty branch in {self.p!r}")
        node = parts[0]
        for nxt in parts[1:]:
            node = ("cat", node, nxt)
        return node

    def _rep(self):
        node = self._atom()
        while True:
            c = self.peek()
            if c in _POSTFIX:
                self.take()
                lo, hi = _POSTFIX[c]
                node = ("rep", node, lo, hi)
            elif c == "{":
                self.take()
                spec = ""
                while self.peek() not in (None, "}"):
                    spec += self.take()
                if self.peek() != "}":
                    raise ValueError(f"unterminated {{}} in {self.p!r}")
                self.take()
                if "," in spec:
                    lo_s, hi_s = spec.split(",", 1)
                    lo, hi = int(lo_s), (int(hi_s) if hi_s else None)
                else:
                    lo = hi = int(spec)
                if hi is not None and hi < lo:
                    raise ValueError(f"bad repeat {{{spec}}} in {self.p!r}")
                node = ("rep", node, lo, hi)
            else:
                return node

    def _atom(self):
        c = self.take()
        if c == "(":
            node = self._alt()
            if self.peek() != ")":
                raise ValueError(f"unbalanced ( in {self.p!r}")
            self.take()
            return node
        if c == "[":
            return self._cls()
        if c == ".":
            return ("any",)
        if c == "\\":
            if self.peek() is None:
                raise ValueError(f"trailing escape in {self.p!r}")
            e = self.take()
            # RE2 gives alphanumeric escapes class/anchor meaning (\w \d \s
            # \b \B \A \z, octal \1, ...) that this subset does not implement
            # — treating them as the literal letter would make the DFA's
            # language diverge from RE2's and the carry pruning unsound, so
            # reject at construction (the runner's contract).
            if e.isalnum():
                raise ValueError(
                    f"unsupported escape \\{e} in {self.p!r} (class/anchor "
                    "escapes are not part of the symbol-pattern subset)"
                )
            return ("char", frozenset(e), False)
        if c in ")|*+?{":
            raise ValueError(f"unexpected {c!r} at {self.i - 1} in {self.p!r}")
        if c in "^$":
            raise ValueError(
                f"anchor {c!r} unsupported in {self.p!r} (RE2 treats it as "
                "line boundary; the symbol-pattern subset has no anchors)"
            )
        return ("char", frozenset(c), False)

    def _cls(self):
        neg = False
        if self.peek() == "^":
            self.take()
            neg = True
        chars: set[str] = set()
        first = True
        while self.peek() is not None and (self.peek() != "]" or first):
            first = False
            c = self.take()
            if c == "\\":
                c = self.take()
                if c.isalnum():  # \d \w \s etc. are classes in RE2, not chars
                    raise ValueError(
                        f"unsupported escape \\{c} in class in {self.p!r}"
                    )
            if self.peek() == "-" and self.i + 1 < len(self.p) and self.p[self.i + 1] != "]":
                self.take()
                hi = self.take()
                if hi == "\\":
                    hi = self.take()
                    if hi.isalnum():
                        raise ValueError(
                            f"unsupported escape \\{hi} in class in {self.p!r}"
                        )
                if ord(hi) < ord(c):
                    raise ValueError(f"bad range {c}-{hi} in {self.p!r}")
                chars.update(chr(x) for x in range(ord(c), ord(hi) + 1))
            else:
                chars.add(c)
        if self.peek() != "]":
            raise ValueError(f"unbalanced [ in {self.p!r}")
        self.take()
        if not chars:
            raise ValueError(f"empty class in {self.p!r}")
        return ("char", frozenset(chars), neg)


def _ast_chars(node) -> set[str]:
    tag = node[0]
    if tag == "char":
        return set(node[1])
    if tag == "any":
        return set()
    if tag in ("cat", "alt"):
        return _ast_chars(node[1]) | _ast_chars(node[2])
    if tag == "rep":
        return _ast_chars(node[1])
    raise AssertionError(tag)


# ---------------------------------------------------------------------------
# Thompson NFA → subset DFA
# ---------------------------------------------------------------------------
class _NFA:
    """epsilon-NFA under construction; transitions are per-class bitmask."""

    def __init__(self, n_classes: int):
        self.n_classes = n_classes
        self.eps: list[list[int]] = []
        self.step: list[tuple[np.ndarray, int]] = []  # parallel (class_mask, target)
        self.step_from: list[list[int]] = []

    def state(self) -> int:
        self.eps.append([])
        self.step_from.append([])
        return len(self.eps) - 1

    def edge(self, src: int, mask: np.ndarray, dst: int) -> None:
        self.step.append((mask, dst))
        self.step_from[src].append(len(self.step) - 1)


def _build(nfa: _NFA, node, classes: dict[str, int]):
    """Thompson fragment for ``node`` → (start, accept). Repeats expand by
    rebuilding the sub-fragment (cheap at symbol-pattern sizes)."""
    A = nfa.n_classes
    tag = node[0]
    if tag in ("char", "any"):
        mask = np.zeros(A, dtype=bool)
        if tag == "any":
            mask[:] = True
        else:
            _, chars, neg = node
            for c in chars:
                mask[classes[c]] = True
            if neg:
                mask = ~mask  # complement INCLUDES the OTHER class
        s, a = nfa.state(), nfa.state()
        nfa.edge(s, mask, a)
        return s, a
    if tag == "cat":
        s1, a1 = _build(nfa, node[1], classes)
        s2, a2 = _build(nfa, node[2], classes)
        nfa.eps[a1].append(s2)
        return s1, a2
    if tag == "alt":
        s1, a1 = _build(nfa, node[1], classes)
        s2, a2 = _build(nfa, node[2], classes)
        s, a = nfa.state(), nfa.state()
        nfa.eps[s] += [s1, s2]
        nfa.eps[a1].append(a)
        nfa.eps[a2].append(a)
        return s, a
    if tag == "rep":
        _, sub, lo, hi = node
        s = a = nfa.state()
        for _ in range(lo):  # mandatory copies
            s1, a1 = _build(nfa, sub, classes)
            nfa.eps[a].append(s1)
            a = a1
        if hi is None:  # unbounded tail: one looping copy
            s1, a1 = _build(nfa, sub, classes)
            nfa.eps[a].append(s1)
            nfa.eps[a1].append(s1)
            end = nfa.state()
            nfa.eps[a].append(end)
            nfa.eps[a1].append(end)
            a = end
        else:  # optional copies
            ends = [a]
            for _ in range(hi - lo):
                s1, a1 = _build(nfa, sub, classes)
                nfa.eps[a].append(s1)
                a = a1
                ends.append(a)
            end = nfa.state()
            for e in ends:
                nfa.eps[e].append(end)
            a = end
        return s, a
    raise AssertionError(tag)


def _closure(nfa: _NFA, states: frozenset[int]) -> frozenset[int]:
    seen = set(states)
    stack = list(states)
    while stack:
        for nxt in nfa.eps[stack.pop()]:
            if nxt not in seen:
                seen.add(nxt)
                stack.append(nxt)
    return frozenset(seen)


@dataclass
class SymbolDFA:
    """Compiled DFA over the pattern's symbol classes.

    ``trans[s, a]`` — next state; ``char_class`` maps byte → class (bytes not
    in the pattern share one OTHER class); ``live[s]`` — an accepting state
    is reachable from ``s``; ``accept[s]`` — s accepts. The dead sink is the
    (unique) state with ``~live`` that maps to itself; liveness is what the
    carry pruning consumes.
    """

    trans: np.ndarray  # (S, A) int32
    char_class: np.ndarray  # (256,) int32
    start: int
    accept: np.ndarray  # (S,) bool
    live: np.ndarray  # (S,) bool
    pattern: str

    # ------------------------------------------------------------- compile
    @classmethod
    def compile(cls, pattern: str) -> "SymbolDFA":
        ast = _Parser(pattern).parse()
        chars = sorted(_ast_chars(ast))
        classes = {c: i for i, c in enumerate(chars)}
        A = len(chars) + 1  # + OTHER
        nfa = _NFA(A)
        start, accept = _build(nfa, ast, classes)

        dfa_of: dict[frozenset[int], int] = {}
        rows: list[np.ndarray] = []
        sets: list[frozenset[int]] = []

        def intern(s: frozenset[int]) -> int:
            if s not in dfa_of:
                dfa_of[s] = len(sets)
                sets.append(s)
                rows.append(np.full(A, -1, np.int32))
            return dfa_of[s]

        d0 = intern(_closure(nfa, frozenset([start])))
        # fixpoint over unfilled rows (intern() appends new rows as -1)
        while True:
            todo = [i for i, r in enumerate(rows) if (r == -1).any()]
            if not todo:
                break
            for d in todo:
                cur = sets[d]
                for a in range(A):
                    if rows[d][a] != -1:
                        continue
                    nxt: set[int] = set()
                    for st in cur:
                        for ei in nfa.step_from[st]:
                            mask, dst = nfa.step[ei]
                            if mask[a]:
                                nxt.add(dst)
                    rows[d][a] = intern(_closure(nfa, frozenset(nxt)))

        trans = np.stack(rows)
        acc = np.array([accept in s for s in sets], dtype=bool)
        # liveness: reverse reachability from accepting states
        S = len(sets)
        live = acc.copy()
        changed = True
        while changed:
            changed = False
            reach_live = live[trans].any(axis=1) | acc
            new = reach_live & ~live
            if new.any():
                live |= new
                changed = True

        char_class = np.full(256, len(chars), np.int32)  # default OTHER
        for c, i in classes.items():
            b = c.encode("utf-8", errors="strict")
            if len(b) != 1:
                raise ValueError(f"non-1-byte symbol {c!r} in pattern {pattern!r}")
            char_class[b[0]] = i
        if acc[d0]:
            raise ValueError(f"pattern {pattern!r} matches the empty string")
        return cls(
            trans=trans,
            char_class=char_class,
            start=d0,
            accept=acc,
            live=live,
            pattern=pattern,
        )

    # ----------------------------------------------------------- run (test)
    def run(self, s: str) -> int:
        """Reference scalar run from the start state (tests / debugging)."""
        st = self.start
        for b in s.encode():
            st = int(self.trans[st, self.char_class[b]])
        return st

    # ------------------------------------------------- vectorized pruning
    def earliest_viable_starts(
        self, tails: pa.Array, visited: np.ndarray | None = None
    ) -> np.ndarray:
        """For each tail string, the earliest position q such
        that running the DFA over ``tail[q:]`` ends in a LIVE state — i.e.
        the earliest position that could still start a match extending into
        future batches. ``len(tail)`` when no position is viable (carry
        empty).

        ``visited`` (optional): flat bool mask over the array's data buffer
        (absolute byte coordinates); positions with ``visited == False`` are
        skipped — the scan-frontier fold uses this to ignore positions
        strictly inside already-consumed matches, which a left-to-right
        non-overlapping scanner never visits.

        Right-aligned lockstep over all keys: maintain per key the
        transition FUNCTION of the suffix read so far (composition
        right-to-left, the data-parallel-FSM trick) so each step is one
        vectorized gather; keys whose suffix function is all-dead are
        frozen (dead is absorbing — no earlier position can revive).
        O(maxlive_tail × keys × states) with states ~ pattern size.
        """
        if isinstance(tails, pa.ChunkedArray):
            tails = tails.combine_chunks()
        if tails.null_count:
            raise ValueError("tails must be null-free (fill carry with '')")
        n = len(tails)
        if n == 0:
            return np.zeros(0, np.int64)
        off_np = np.frombuffer(
            tails.buffers()[1],
            dtype=np.int64 if pa.types.is_large_string(tails.type) else np.int32,
        )[tails.offset : tails.offset + n + 1].astype(np.int64)
        data = np.frombuffer(tails.buffers()[2], dtype=np.uint8)
        lens = off_np[1:] - off_np[:-1]
        cls_of = self.char_class

        S = self.trans.shape[0]
        M = np.broadcast_to(np.arange(S, dtype=np.int32), (n, S)).copy()
        v = lens.copy()  # default: nothing viable → empty carry
        alive = lens > 0
        maxL = int(lens.max()) if n else 0
        live = self.live
        for j in range(1, maxL + 1):
            act = np.flatnonzero(alive & (lens >= j))
            if act.size == 0:
                break
            pos_abs = off_np[act] + lens[act] - j
            c = cls_of[data[pos_abs]]
            # newM[k][s] = M[k][trans[s, c_k]] — compose the char's transition
            # under the suffix function read so far
            M_act = np.take_along_axis(M[act], self.trans[:, c].T, axis=1)
            M[act] = M_act
            end_state = M_act[:, self.start]
            ok = live[end_state]
            if visited is not None:
                ok = ok & visited[pos_abs]
            v[act[ok]] = lens[act[ok]] - j
            dead_all = ~live[M_act].any(axis=1)
            alive[act[dead_all]] = False
        return v


def slice_strings(
    arr: pa.Array, starts: np.ndarray, i32_cap: int = np.iinfo(np.int32).max
) -> pa.Array:
    """Per-row ``s[starts[i]:]`` suffix slice, zero-copy-ish: ranges-expanded
    byte gather + rebuilt offsets (pa.utf8 output). ``starts`` are byte
    offsets (symbol strings are ASCII, so chars == bytes)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    n = len(arr)
    if n == 0:
        return pa.array([], pa.string())
    off_np = np.frombuffer(
        arr.buffers()[1],
        dtype=np.int64 if pa.types.is_large_string(arr.type) else np.int32,
    )[arr.offset : arr.offset + n + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    lens = off_np[1:] - off_np[:-1]
    keep = lens - starts
    if (keep < 0).any():
        raise ValueError("slice start beyond string end")
    out_off = np.zeros(n + 1, np.int64)
    np.cumsum(keep, out=out_off[1:])
    total = int(out_off[-1])
    src = np.repeat(off_np[:-1] + starts, keep) + (
        np.arange(total, dtype=np.int64) - np.repeat(out_off[:-1], keep)
    )
    out_bytes = data[src]
    if total > i32_cap:
        # >2 GB of sliced bytes: int32 utf8 offsets would silently wrap —
        # emit large_string (int64 offsets) instead. NOTE: the CEP stream
        # runner pins its tail state to plain string, so a shard carrying
        # >2 GB of tails still fails LOUDLY at its own state encode
        # (ArrowCapacityError) — this fallback protects direct callers and
        # keeps the slice itself correct; it does not lift the per-shard
        # carry limit of utf8-pinned state schemas
        return pa.Array.from_buffers(
            pa.large_utf8(),
            n,
            [None, pa.py_buffer(out_off.tobytes()), pa.py_buffer(out_bytes.tobytes())],
        )
    return pa.Array.from_buffers(
        pa.utf8(),
        n,
        [None, pa.py_buffer(out_off.astype(np.int32).tobytes()), pa.py_buffer(out_bytes.tobytes())],
    )
