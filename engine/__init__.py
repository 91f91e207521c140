"""PySpark-native query-driven extraction engine.

A from-scratch rebuild of the capabilities of
``punyaikhwan/intelligent-html-parser`` (reference snapshot read-only
at ``/root/reference``) on Spark's execution model: DataFrame plans,
Arrow-batched pandas UDF kernels, explicit partitioning/skew handling,
and per-partition lineage for exact resume.  See SURVEY.md for the
operator-by-operator mapping.
"""

__version__ = "0.1.0"
