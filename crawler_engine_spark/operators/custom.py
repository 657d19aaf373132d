"""User-defined selector-rule extraction — the reference's ``CustomExtractor``
facade (core/custom_extractor.py:18-240) re-expressed over DataFrames.

The reference wraps its rule-based strategy with a mutable rule registry
(``add_rule(name, selector, priority)``, ``add_selector``, ``clear_rules``)
and per-process statistics.  Here the same registry configures the
``ExtractOptions`` threaded into the vectorized rule-based kernel, and
``extract`` runs it over a whole pages DataFrame; statistics become a Spark
aggregation over the result instead of driver-side counters.

``add_exclude_selector`` is kept for API parity but — like the reference,
whose rule-based strategy never reads ``exclude_selectors``
(custom_extractor.py:171 sets it; no strategy consumes it) — it does not
affect extraction output.
"""

from __future__ import annotations

from dataclasses import replace
from typing import Dict, List, Optional

from pyspark.sql import DataFrame, functions as F

from ..kernels.extract import DEFAULT_OPTIONS, ExtractOptions
from .extraction import extract_pages


class CustomExtractor:
    """Rule registry + DataFrame extraction (custom_extractor.py parity)."""

    def __init__(self, opts: ExtractOptions = DEFAULT_OPTIONS) -> None:
        self._base_opts = opts
        self._rules: Dict[str, dict] = {}
        self._selectors: List[str] = []
        self._exclude_selectors: List[str] = []

    # ------------------------------------------------------------ registry
    def add_rule(
        self,
        rule_name: str,
        selector: str,
        extraction_type: str = "text",
        fields: Optional[List[str]] = None,
        priority: int = 10,
    ) -> "CustomExtractor":
        self._rules[rule_name] = {
            "selector": selector,
            "extraction_type": extraction_type,
            "fields": fields or [],
            "priority": priority,
        }
        return self

    def remove_rule(self, rule_name: str) -> "CustomExtractor":
        self._rules.pop(rule_name, None)
        return self

    def add_selector(self, selector: str) -> "CustomExtractor":
        if selector not in self._selectors:
            self._selectors.append(selector)
        return self

    def add_exclude_selector(self, selector: str) -> "CustomExtractor":
        if selector not in self._exclude_selectors:
            self._exclude_selectors.append(selector)
        return self

    def clear_rules(self) -> "CustomExtractor":
        self._rules.clear()
        self._selectors.clear()
        self._exclude_selectors.clear()
        return self

    def get_rules(self) -> Dict[str, dict]:
        return dict(self._rules)

    def get_selectors(self) -> List[str]:
        return list(self._selectors)

    def get_exclude_selectors(self) -> List[str]:
        return list(self._exclude_selectors)

    # ---------------------------------------------------------- extraction
    def options(self) -> ExtractOptions:
        return replace(
            self._base_opts,
            custom_rules=tuple(
                (name, (rule["selector"],), rule["priority"])
                for name, rule in self._rules.items()
            ),
            content_selectors=tuple(self._selectors),
        )

    def extract(self, pages: DataFrame, query: Optional[str] = None) -> DataFrame:
        """Rule-based extraction over a pages DataFrame with the registered
        rules (mode is pinned to rule_based, as in the reference facade)."""
        return extract_pages(pages, mode="rule_based", query=query, opts=self.options())

    def statistics(self, results: DataFrame) -> DataFrame:
        """The reference's get_statistics counters as a Spark aggregation."""
        return results.agg(
            F.count("*").alias("total_extractions"),
            F.sum(F.when(F.col("success"), 1).otherwise(0)).alias(
                "successful_extractions"
            ),
            F.round(
                F.sum(F.when(F.col("success"), 1).otherwise(0))
                / F.greatest(F.count("*"), F.lit(1)),
                4,
            ).alias("success_rate"),
            F.lit(len(self._rules)).alias("custom_rules_count"),
            F.lit(len(self._selectors)).alias("custom_selectors_count"),
        )
