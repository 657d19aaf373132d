"""Engine configuration mirroring the reference's knob names.

The reference loads ``ExtractorConfig`` from env vars prefixed
``INTELLIGENT_EXTRACTOR_*`` (models/config.py:248-394); this engine accepts
the same names where they have a distributed analog, plus crawl-specific
knobs.  AI/browser knobs have no analog in fetch-simulate mode and are
intentionally absent.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from .kernels.extract import ExtractOptions


def _env_float(name: str, default: float) -> float:
    try:
        return float(os.environ[name])
    except (KeyError, ValueError):
        return default


def _env_int(name: str, default: int) -> int:
    try:
        return int(os.environ[name])
    except (KeyError, ValueError):
        return default


def _env_bool(name: str, default: bool) -> bool:
    v = os.environ.get(name)
    if v is None:
        return default
    return v.strip().lower() in ("1", "true", "yes", "on")


@dataclass
class EngineConfig:
    # Politeness (PerformanceConfig analogs, models/config.py:150-172)
    requests_per_second: float = 2.0
    delay_between_requests: float = 0.5
    round_seconds: float = 10.0
    num_salts: int = 8

    # Frontier / seen set
    bloom_partitions: int = 32
    bloom_bits_per_segment: int = 1 << 20
    max_rounds: int = 100

    # Extraction (ExtractionConfig analogs, models/config.py:110-147)
    mode: str | None = None  # None → adaptive ("adaptive always wins")
    extract_opts: ExtractOptions = field(default_factory=ExtractOptions)

    @classmethod
    def from_env(cls) -> "EngineConfig":
        opts = ExtractOptions(
            relevance_threshold=_env_float("INTELLIGENT_EXTRACTOR_RELEVANCE_THRESHOLD", 0.6),
            confidence_threshold=_env_float("INTELLIGENT_EXTRACTOR_CONFIDENCE_THRESHOLD", 0.7),
            min_content_length=_env_int("INTELLIGENT_EXTRACTOR_MIN_CONTENT_LENGTH", 100),
            remove_ads=_env_bool("INTELLIGENT_EXTRACTOR_REMOVE_ADS", True),
            remove_navigation=_env_bool("INTELLIGENT_EXTRACTOR_REMOVE_NAVIGATION", True),
            enable_hidden_content_handling=_env_bool(
                "INTELLIGENT_EXTRACTOR_ENABLE_HIDDEN_CONTENT", True
            ),
            extract_tables=_env_bool("INTELLIGENT_EXTRACTOR_EXTRACT_TABLES", True),
            extract_lists=_env_bool("INTELLIGENT_EXTRACTOR_EXTRACT_LISTS", True),
            extract_forms=_env_bool("INTELLIGENT_EXTRACTOR_EXTRACT_FORMS", False),
            extract_links=_env_bool("INTELLIGENT_EXTRACTOR_EXTRACT_LINKS", True),
            extract_images=_env_bool("INTELLIGENT_EXTRACTOR_EXTRACT_IMAGES", False),
        )
        mode = os.environ.get("INTELLIGENT_EXTRACTOR_STRATEGY") or None
        return cls(
            requests_per_second=_env_float("INTELLIGENT_EXTRACTOR_REQUESTS_PER_SECOND", 2.0),
            delay_between_requests=_env_float("INTELLIGENT_EXTRACTOR_DELAY_BETWEEN_REQUESTS", 0.5),
            round_seconds=_env_float("CRAWL_ROUND_SECONDS", 10.0),
            num_salts=_env_int("CRAWL_NUM_SALTS", 8),
            bloom_partitions=_env_int("CRAWL_BLOOM_PARTITIONS", 32),
            bloom_bits_per_segment=_env_int("CRAWL_BLOOM_BITS", 1 << 20),
            max_rounds=_env_int("CRAWL_MAX_ROUNDS", 100),
            mode=mode,
            extract_opts=opts,
        )
