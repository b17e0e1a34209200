"""lingua_spark: PySpark-native language-ID + quality-filter engine.

A from-scratch re-expression of Marcono1234/lingua's detection semantics
(SURVEY.md) as vectorized NumPy cores applied per Arrow batch via pandas
UDFs over broadcast frequency tables, fused with quality filtering and
PII scrubbing per BASELINE.json's north rule.
"""

__version__ = "0.1.0"
