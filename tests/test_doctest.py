"""Execute the doc examples in every public module's docstrings.

The reference runs a doc test on every public function via ``cargo test``
(``/root/reference/src/lib.rs:28-72``, per-fn examples e.g.
``levenshtein.rs:1373-1379``); this is the equivalent harness.  Factory
metrics (`_int_metric.build_module`) generate their examples from a
canonical pair; hand-written modules carry explicit ones.
"""

import doctest

import pytest

from rapidfuzz_tpu import fuzz
from rapidfuzz_tpu.distance import (damerau_levenshtein, hamming, indel,
                                    jaro, jaro_winkler, lcs_seq, levenshtein,
                                    osa, postfix, prefix)
from rapidfuzz_tpu.models import process

MODULES = [levenshtein, indel, lcs_seq, osa, damerau_levenshtein, hamming,
           jaro, jaro_winkler, prefix, postfix, fuzz, process]


@pytest.mark.parametrize("mod", MODULES, ids=lambda m: m.__name__)
def test_module_doctests(mod):
    result = doctest.testmod(mod, verbose=False)
    assert result.attempted > 0, f"{mod.__name__} has no doc examples"
    assert result.failed == 0
