"""Output connectors: Postgres (JDBC / COPY), parquet/CSV/JSON lake files."""
