"""Spark Column-expression libraries (JVM-side, whole-stage-codegen friendly).

Everything here is built from pyspark.sql.functions — no Python UDFs — so the
expressions stay inside Tungsten codegen at any scale.
"""
