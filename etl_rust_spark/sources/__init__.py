"""Extraction sources: the reference's scan surface, Spark-first.

- ``ranges``     S-01/S-02: block-index range + CSV list scans
- ``checkpoint`` S-08: resume-from-sink high-watermark
- ``chain``      §2.7: the pluggable ChainConfig protocol + a synthetic
                 deterministic chain standing in for a JSON-RPC node
- ``rpc``        S-04/05/06/07: distributed JSON-RPC fetch, tip probe,
                 account lookup, throughput estimator
- ``datasource`` §4.3: the chain as a registered Spark DataSource
                 (batch + streaming, offset = block index)
"""

from etl_rust_spark.sources.ranges import block_range, block_list_csv  # noqa: F401
from etl_rust_spark.sources.checkpoint import pick_up_from_previous_range  # noqa: F401
from etl_rust_spark.sources.chain import ChainConfig, SyntheticChain  # noqa: F401
from etl_rust_spark.sources.datasource import ChainDataSource  # noqa: F401
