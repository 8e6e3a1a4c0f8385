"""Pure scalar / vectorized functions (no Ray dependency).

These are the port list of SURVEY.md §2.7: normalizers, tokenizer, value
parsers, type guessing, unit conversion, URL/domain utilities, n-grams,
similarity measures, hashing/sketches and text statistics.  Every function is
deterministic; the hot paths have vectorized (numpy / pyarrow) variants used
inside ``map_batches``.
"""
