"""imc_ray — a from-scratch, Ray-Data-native TRACLUS-style spatial/trajectory
engine with the query and data-processing capabilities of the reference repo
``eyalw711/IndoorMapConstruction`` (see SURVEY.md).

Everything here derives from public knowledge only: the TRACLUS paper
(Lee, Han, Whang, SIGMOD 2007), the Ray Data / pyarrow public APIs, and the
driver-provided BASELINE.json contract.  The reference checkout at
/root/reference was empty at survey time (SURVEY.md §0), so the single-node
NumPy implementation in :mod:`imc_ray.oracle` is the golden reference for the
distributed engine.

Library code never calls ``ray.init()`` — sessions are owned by the driver,
``bench.py`` and the pytest fixture only.
"""

__version__ = "0.1.0"


def _tune_allocator() -> None:
    """Keep large freed buffers in the process heap instead of returning
    them to the OS (glibc ``mallopt``): the batch-vectorized kernels
    allocate/free hundreds of MB per batch, and the default
    mmap-per-large-buffer policy re-faults those pages on EVERY batch —
    kernel reclaim time that serializes across workers and showed up as a
    parallelism-independent wall component in the round-5 scaling work.
    Runs in every process that imports the library (driver and Ray
    workers); no-op on non-glibc platforms."""
    import ctypes

    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(-1, 1 << 30)   # M_TRIM_THRESHOLD: never trim the heap
        libc.mallopt(-3, 1 << 30)   # M_MMAP_THRESHOLD: big buffers via heap
    except Exception:
        pass


_tune_allocator()
