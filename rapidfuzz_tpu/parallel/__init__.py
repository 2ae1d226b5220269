"""Scale-out layer: device meshes, sharded corpus scans, top-k merges.

The reference is single-threaded (SURVEY.md §2.4 — no threads, no
collectives anywhere in ``/root/reference/src``); the parallel design here
comes from the BASELINE.json north star: corpus sharded data-parallel over a
``("data",)`` mesh, query PM state replicated, per-shard top-k reduced with
XLA collectives over ICI.
"""

from .bucketed import BucketedScanner  # noqa: F401
from .mesh import data_mesh  # noqa: F401
from .scan import CorpusScanner, sharded_distances  # noqa: F401
from .topk import topk_merge  # noqa: F401
from . import multihost  # noqa: F401
