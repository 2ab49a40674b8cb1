"""Query surface: every SURVEY.md §2 operator demonstrated as a registered
query over the driver testdata, each with a DuckDB oracle."""

from d3d_etl_spark.queries.registry import REGISTRY, Query, register  # noqa: F401


def load_all() -> None:
    """Import every query module so registration side-effects run."""
    from d3d_etl_spark.queries import (  # noqa: F401
        aggregates,
        boards,
        bucketed,
        curation,
        dedup,
        domain,
        fuzzy,
        pbp_fixture,
        pbpwide,
        pipeline_corpus,
        relational,
        roster,
        sampling,
        scalars,
        simsearch,
        splits,
        stateful,
        textops,
        value,
        war_chain,
        windows,
        zorder,
    )
