"""Dataset plugin packages (one per source dataset).

Mirrors the reference's ``datasets/`` layout: a YAML registry
(``registry.yaml``) names each dataset's connector type, table, and
transformer dotted-path; each subpackage holds a ``config.yaml`` (API +
schema + validation) and a ``transformer.py`` (Spark DataFrame transform).
"""
