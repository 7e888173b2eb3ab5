"""Spark-side operators: thin DataFrame orchestration over the numpy
kernels (SURVEY.md §2). Per the input_hint, all per-row math runs inside
Arrow-batched pandas UDFs — never row-at-a-time Python."""
