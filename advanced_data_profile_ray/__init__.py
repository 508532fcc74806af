"""advanced_data_profile_ray — a Ray-Data-native data-profiling and
constraint-validation engine.

Built from scratch with the query/data-processing capabilities of the
reference profiler ``stabgan/Advanced-Data-Profile``
(``/root/reference/Data_Profiler_TCS/Profiler.py``), re-expressed as
distributed, mergeable, streaming computations over Arrow batches of a
``ray.data.Dataset``:

- ``state``:     picklable, mergeable sketches (moments, HLL, t-digest,
                 heavy hitters, fixed-bin histograms, null/blank, type vote).
- ``stages``:    ``map_batches`` stage bodies (profile partials, referential
                 broadcast joins, language-id actor pools, dedup, ANN).
- ``functions``: pure vectorized kernels (text stats, lang-id heuristics,
                 drift statistics, hashing, entropy).
- ``sources``:   readers + the deterministic transcript synthesizer.
- ``pipelines``: end-to-end pipelines (profile, validate, dedup, queries).

Nothing here calls ``ray.init()`` — sessions are owned by the caller
(tests' conftest fixture, bench.py, or the external driver).
"""

__version__ = "0.1.0"
