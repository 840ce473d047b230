"""O-04: feature validation mirrors the reference's compile_error! gates
(src/features.rs:9-35) as bootstrap-time ConfigError."""

from __future__ import annotations

import pytest

from etl_rust_spark.config import ConfigError, FeatureConfig


def test_default_config_valid():
    FeatureConfig().validate()


def test_no_sink_rejected():
    with pytest.raises(ConfigError, match="must be enabled"):
        FeatureConfig(sinks=set()).validate()


def test_no_chain_rejected():
    with pytest.raises(ConfigError, match="No blockchain feature"):
        FeatureConfig(chain="").validate()


def test_unknown_chain_rejected():
    with pytest.raises(ConfigError, match="Unknown chain"):
        FeatureConfig(chain="mainnet-beta").validate()


def test_rabbitmq_variants_mutually_exclusive():
    with pytest.raises(ConfigError, match="mutually"):
        FeatureConfig(sinks={"rabbitmq_stream", "rabbitmq_classic"}).validate()


def test_both_rabbitmq_alone_fine():
    FeatureConfig(sinks={"rabbitmq_stream"}).validate()
    FeatureConfig(sinks={"rabbitmq_classic"}).validate()


def test_bad_timestamp_mode_rejected():
    with pytest.raises(ConfigError, match="INT_TIMESTAMP"):
        FeatureConfig(timestamp_mode="both").validate()


def test_bad_publisher_mode_rejected():
    with pytest.raises(ConfigError, match="SINGLE_PUBLISHER"):
        FeatureConfig(publisher_mode="").validate()


def test_cli_rejects_invalid_chain_before_spark():
    from etl_rust_spark.__main__ import main

    with pytest.raises(SystemExit):
        main(["--chain", "nope", "index-range", "0", "1", "--out", "/tmp/x"])
