"""Input connectors: Discogs-style XML dumps + generic parquet/CSV/JSON."""
