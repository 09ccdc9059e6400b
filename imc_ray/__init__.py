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
