"""Operator builders — the engine's capability surface.

Each module maps a slice of the reference's operator inventory (SURVEY.md §2)
or a beyond-reference large-scale data-pipeline capability onto declarative
PySpark DataFrame plans.
"""
