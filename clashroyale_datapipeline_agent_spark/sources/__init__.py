from clashroyale_datapipeline_agent_spark.sources.readers import (  # noqa: F401
    load_card_metadata,
    load_star_table,
    load_star_tables,
    read_raw_battles_json,
)
