"""Feature/config validation at session bootstrap (O-04).

The reference validates its cargo feature matrix at COMPILE time with
``compile_error!`` (src/features.rs:9-35): exactly one blockchain, at
least one sink, exactly one timestamp mode, exactly one publisher mode,
mutually-exclusive broker variants.  Python has no compile-time feature
gates, so the same contradictions are rejected at bootstrap: build a
:class:`FeatureConfig` and ``validate()`` raises ``ConfigError`` with
the reference's message shapes before any Spark work starts.

The CLI (`__main__.py`) routes through this; library users validate
explicitly (or get transport errors later — validation is the loud,
early path).
"""

from __future__ import annotations

from dataclasses import dataclass, field

__all__ = ["ConfigError", "FeatureConfig", "SINKS", "CHAINS", "TIMESTAMP_MODES"]

# Sink identifiers mirror the reference's output feature names
# (features.rs:9-19), lowered; jsonl/json are the file sinks.
SINKS = {
    "jsonl", "json", "google_pubsub", "google_cloud_storage",
    "apache_kafka", "rabbitmq_stream", "rabbitmq_classic", "parquet",
}
CHAINS = {"synthetic"}  # real chains register via ChainConfig (SURVEY §2.7)
TIMESTAMP_MODES = {"int", "string"}  # INT_TIMESTAMP / STRING_TIMESTAMP
PUBLISHER_MODES = {"single", "separate"}  # SINGLE_PUBLISHER / SEPARATE_PUBLISHERS


class ConfigError(ValueError):
    """Invalid feature combination (the reference's compile_error!)."""


@dataclass
class FeatureConfig:
    chain: str = "synthetic"
    sinks: set[str] = field(default_factory=lambda: {"parquet"})
    timestamp_mode: str = "int"
    publisher_mode: str = "separate"

    def validate(self) -> "FeatureConfig":
        # features.rs:30-35 — exactly one blockchain.
        if not self.chain:
            raise ConfigError(
                "No blockchain feature has been enabled. Please select one."
            )
        if self.chain not in CHAINS:
            raise ConfigError(f"Unknown chain {self.chain!r}; known: {sorted(CHAINS)}")
        # features.rs:9-19 — at least one sink, all known.
        if not self.sinks:
            raise ConfigError(
                "Either `JSONL`, `JSON`, `GOOGLE_PUBSUB`, `GOOGLE_CLOUD_STORAGE`, "
                "`APACHE_KAFKA`, `RABBITMQ_STREAM`, or `RABBITMQ_CLASSIC` "
                "must be enabled."
            )
        unknown = self.sinks - SINKS
        if unknown:
            raise ConfigError(f"Unknown sinks: {sorted(unknown)}")
        # The rabbitmq variants are mutually exclusive (features.rs module doc).
        if {"rabbitmq_stream", "rabbitmq_classic"} <= self.sinks:
            raise ConfigError(
                "Features `RABBITMQ_QUEUE` and `RABBITMQ_STREAM` are mutually "
                "exclusive. Please select only one."
            )
        # features.rs:20-21 — exactly one timestamp mode.
        if self.timestamp_mode not in TIMESTAMP_MODES:
            raise ConfigError(
                "Either `INT_TIMESTAMP` or `STRING_TIMESTAMP` must be enabled."
            )
        # features.rs:23-28 — exactly one publisher mode.
        if self.publisher_mode not in PUBLISHER_MODES:
            raise ConfigError(
                "Either `SINGLE_PUBLISHER` or `SEPARATE_PUBLISHERS` must be enabled"
            )
        return self
