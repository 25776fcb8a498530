"""Interop surfaces that let non-Delta engines read jodie_spark tables:
symlink manifests live on DeltaTable.generate(); this package adds
UniForm-style Apache Iceberg metadata generation (iceberg.py) on top of
a dependency-free Avro object-container codec (avro.py)."""
