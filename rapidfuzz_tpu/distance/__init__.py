"""Metric modules, mirroring ``rapidfuzz::distance`` (``src/lib.rs:97-100``)."""

from . import damerau_levenshtein  # noqa: F401
from . import hamming  # noqa: F401
from . import indel  # noqa: F401
from . import jaro  # noqa: F401
from . import jaro_winkler  # noqa: F401
from . import lcs_seq  # noqa: F401
from . import levenshtein  # noqa: F401
from . import osa  # noqa: F401
from . import postfix  # noqa: F401
from . import prefix  # noqa: F401
from ._editops import (Editop, Editops, MatchingBlock,  # noqa: F401
                       Opcode, Opcodes)

__all__ = [
    "damerau_levenshtein", "hamming", "indel", "jaro", "jaro_winkler",
    "lcs_seq", "levenshtein", "osa", "postfix", "prefix",
    "Editop", "Editops", "Opcode", "Opcodes", "MatchingBlock",
]
