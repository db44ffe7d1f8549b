from .registry import all_queries, all_oracle_sql  # noqa: F401
