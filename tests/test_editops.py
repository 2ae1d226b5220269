"""Editops / opcodes / matching-blocks conformance.

The reference crate has no alignment API (its recording hooks are dead
scaffolding, ``levenshtein.rs:176-210``); the semantics tested here are
the wider rapidfuzz ecosystem's: a minimal edit script whose length
equals the distance and whose replay reconstructs the destination.
Device kernels record the bit-rows; the traceback is host-side
(``rapidfuzz_tpu/distance/_editops.py``).
"""

import numpy as np
import pytest

from rapidfuzz_tpu.distance import (Editop, Editops, Opcode, indel,
                                    lcs_seq, levenshtein)


def _check_lev(s1, s2):
    ops = levenshtein.editops(s1, s2)
    dist = levenshtein.distance(s1, s2)
    assert len(ops) == dist, (s1, s2)
    assert ops.src_len == len(s1) and ops.dest_len == len(s2)
    assert ops.apply(s1, s2) == s2, (s1, s2)
    # positions are monotone non-decreasing
    src = [o.src_pos for o in ops]
    dst = [o.dest_pos for o in ops]
    assert src == sorted(src) and dst == sorted(dst)
    return ops


def _check_indel(s1, s2):
    ops = indel.editops(s1, s2)
    assert len(ops) == indel.distance(s1, s2), (s1, s2)
    assert all(o.tag in ("insert", "delete") for o in ops)
    assert ops.apply(s1, s2) == s2, (s1, s2)
    return ops


def test_kitten_golden():
    ops = _check_lev("kitten", "sitting")
    assert [(o.tag, o.src_pos, o.dest_pos) for o in ops] == [
        ("replace", 0, 0), ("replace", 4, 4), ("insert", 6, 6)]


def test_opcodes_golden():
    oc = levenshtein.opcodes("kitten", "sitting")
    assert [(o.tag, o.src_start, o.src_end, o.dest_start, o.dest_end)
            for o in oc] == [
        ("replace", 0, 1, 0, 1), ("equal", 1, 4, 1, 4),
        ("replace", 4, 5, 4, 5), ("equal", 5, 6, 5, 6),
        ("insert", 6, 6, 6, 7)]


def test_empty_and_trivial():
    assert len(levenshtein.editops("", "")) == 0
    ops = levenshtein.editops("", "abc")
    assert [(o.tag, o.src_pos, o.dest_pos) for o in ops] == [
        ("insert", 0, 0), ("insert", 0, 1), ("insert", 0, 2)]
    ops = levenshtein.editops("abc", "")
    assert [o.tag for o in ops] == ["delete"] * 3
    assert len(levenshtein.editops("abc", "abc")) == 0
    assert len(indel.editops("", "ab")) == 2
    assert lcs_seq.editops("ab", "ab").apply("ab", "ab") == "ab"


def test_editops_opcodes_roundtrip():
    rng = np.random.default_rng(3)
    for _ in range(30):
        n1, n2 = rng.integers(0, 20, 2)
        s1 = "".join(rng.choice(list("abcd"), n1))
        s2 = "".join(rng.choice(list("abcd"), n2))
        ops = _check_lev(s1, s2)
        oc = ops.as_opcodes()
        back = oc.as_editops()
        assert list(back) == list(ops), (s1, s2)
        # opcodes tile both strings completely, in order
        i = j = 0
        for o in oc:
            assert (o.src_start, o.dest_start) == (i, j)
            i, j = o.src_end, o.dest_end
        assert (i, j) == (len(s1), len(s2))


def test_inverse():
    rng = np.random.default_rng(4)
    for _ in range(20):
        s1 = "".join(rng.choice(list("abcde"), rng.integers(0, 15)))
        s2 = "".join(rng.choice(list("abcde"), rng.integers(0, 15)))
        inv = levenshtein.editops(s1, s2).inverse()
        assert len(inv) == levenshtein.distance(s2, s1)
        assert inv.apply(s2, s1) == s1


def test_matching_blocks():
    ops = levenshtein.editops("kitten", "sitting")
    blocks = ops.as_matching_blocks()
    assert [(b.a, b.b, b.size) for b in blocks] == [
        (1, 1, 3), (5, 5, 1), (6, 7, 0)]
    for b in blocks[:-1]:
        assert "kitten"[b.a:b.a + b.size] == "sitting"[b.b:b.b + b.size]


def test_random_sweep_vs_distance():
    rng = np.random.default_rng(7)
    alphabets = [list("ab"), list("abcdefgh"),
                 [chr(c) for c in range(0x400, 0x410)]]  # Cyrillic
    for alpha in alphabets:
        for _ in range(25):
            n1, n2 = rng.integers(0, 40, 2)
            s1 = "".join(rng.choice(alpha, n1))
            s2 = "".join(rng.choice(alpha, n2))
            _check_lev(s1, s2)
            _check_indel(s1, s2)


def test_long_pair_multiword():
    # >32 chars exercises the multi-word (W>1) recorded kernel
    rng = np.random.default_rng(11)
    s1 = "".join(rng.choice(list("abcdef"), 150))
    s2 = "".join(rng.choice(list("abcdef"), 170))
    _check_lev(s1, s2)
    _check_indel(s1, s2)


def test_integer_sequences():
    a = np.array([1, 2, 3, 2 ** 40], np.int64)
    b = np.array([1, 9, 3, 2 ** 40, 7], np.int64)
    ops = levenshtein.editops(a, b)
    assert len(ops) == levenshtein.distance(a, b) == 2
    assert ops.apply(a, b) == list(b)


def test_lcs_indel_share_alignment():
    ops_l = lcs_seq.editops("qabxcd", "abycdf")
    ops_i = indel.editops("qabxcd", "abycdf")
    assert list(ops_l) == list(ops_i)
    assert len(ops_i) == indel.distance("qabxcd", "abycdf")


def test_record_cap():
    with pytest.raises(ValueError, match="bit-rows"):
        levenshtein.editops("a" * 40000, "b" * 40000)


def test_container_dunders():
    ops = levenshtein.editops("kitten", "sitting")
    assert ops[0] == Editop("replace", 0, 0)
    assert ops == Editops(list(ops), 6, 7)
    oc = ops.as_opcodes()
    assert oc[0] == Opcode("replace", 0, 1, 0, 1)
    assert "replace" in repr(ops) and "equal" in repr(oc)


# ------------------------------------------------------------ batch forms

def test_editops_many_matches_pairwise():
    """One-vs-many recording scan == per-pair editops (lev + lcs)."""
    q = "levenshtein"
    choices = ["lewenstein", "", "levenshtein", "frankenstein",
               "l", "x" * 40, "einstein"]
    many = levenshtein.editops_many(q, choices)
    for c, ops in zip(choices, many):
        assert list(ops) == list(levenshtein.editops(q, c)), c
        assert ops.apply(q, c) == c
    many_i = indel.editops_many(q, choices)
    for c, ops in zip(choices, many_i):
        assert list(ops) == list(indel.editops(q, c)), c
        assert ops.apply(q, c) == c


def test_editops_many_empty_query():
    many = levenshtein.editops_many("", ["ab", ""])
    assert [o.tag for o in many[0]] == ["insert", "insert"]
    assert len(many[1]) == 0
    assert lcs_seq.editops_many("", ["ab"])[0].apply("", "ab") == "ab"


def test_extract_editops():
    from rapidfuzz_tpu.models import extract, extract_editops
    corpus = ["sitting", "mitten", "kitchen", "bitter", "written",
              "smitten", "kittens"]
    hits = extract_editops("kitten", corpus, scorer="levenshtein", limit=3)
    plain = extract("kitten", corpus, scorer="levenshtein", limit=3)
    assert [(c, s, i) for c, s, i, _ in hits] == plain
    for c, _, _, ops in hits:
        assert list(ops) == list(levenshtein.editops("kitten", c))
        assert ops.apply("kitten", c) == c
    # indel alignment flavor + cutoff filtering + unsupported scorer
    hits = extract_editops("kitten", corpus, scorer="indel", limit=2)
    for c, _, _, ops in hits:
        assert all(o.tag in ("insert", "delete") for o in ops)
        assert ops.apply("kitten", c) == c
    assert extract_editops("zzzz", corpus, scorer="levenshtein",
                           score_cutoff=0.99) == []
    with pytest.raises(ValueError, match="alignment"):
        extract_editops("kitten", corpus, scorer="jaro")


def test_extract_editops_processor():
    from rapidfuzz_tpu import fuzz
    from rapidfuzz_tpu.models import extract_editops
    hits = extract_editops("KITTEN!", ["sitting", "MITTEN"], limit=2,
                           scorer="levenshtein",
                           processor=fuzz.default_process)
    for c, _, _, ops in hits:
        # alignment is over the processed forms
        assert ops.apply(fuzz.default_process("KITTEN!"),
                         fuzz.default_process(c)) == fuzz.default_process(c)


def test_as_list_compat():
    ops = levenshtein.editops("kitten", "sitting")
    assert ops.as_list() == [("replace", 0, 0), ("replace", 4, 4),
                             ("insert", 6, 6)]
    assert ops.as_opcodes().as_list()[0] == ("replace", 0, 1, 0, 1)
