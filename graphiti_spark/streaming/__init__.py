"""graphiti_spark — PySpark-native KG construction engine."""
