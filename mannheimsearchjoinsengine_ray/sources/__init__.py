"""Sources: deterministic synthetic Common-Crawl-style page corpus (FIXTURES.md
F1/F4) and Parquet readers."""
