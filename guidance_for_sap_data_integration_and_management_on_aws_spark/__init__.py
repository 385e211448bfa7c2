"""PySpark-native analytics engine with the capabilities of
``aws-solutions-library-samples/guidance-for-sap-data-integration-and-management-on-aws``.

The reference (read-only at ``/root/reference/``) is a single-threaded SAP
RFC -> S3 ingestion script (``pyrfc_read_table/pyrfc_read_table.py``).  This
package rebuilds that ingestion pipeline as distributed Spark DataFrame
operators (``sources/``) and provides the relational / streaming /
LLM-data-pipeline analytics surface the guidance's data lake exists to serve
(``operators/``, ``streaming/``), per ``/root/repo/SURVEY.md``.

Everything here is Spark-first: DataFrame / SQL plans optimized by Catalyst,
built-in ``pyspark.sql.functions`` in hot paths, Pandas UDFs only where the
built-ins genuinely cannot express the semantics.
"""

__version__ = "0.1.0"
