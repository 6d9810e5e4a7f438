"""Domain pipelines: each reference app as a pure DataFrame transform.

One module per reference layer; every transform is source/sink-agnostic
(``transform(df, ...) -> DataFrame``) so the same plan runs:

- batch over fixture tables (tests, DuckDB-oracle-able), and
- streaming via ``streaming.runner`` (readStream -> transform -> writeStream).

This is the parity surface for the reference's 19 standing apps
(SURVEY.md §0): DIM router (1), DWD fact extraction (7), DWS windowed
aggregates (11).
"""
