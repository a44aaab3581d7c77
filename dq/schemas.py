"""Declared schemas + type normalization.

Reproduces the reference's 5-way type-class normalization
(``core/quality_checks.py:113-184`` in /root/reference): any type string
containing ``int`` → int-class; float/double/decimal → float-class
(decimal precision is deliberately NOT validated, matching the reference);
bool → bool; date/time/stamp → datetime; explicit string/binary/array/
map/struct mappings; unknown → string.

Also normalizes *actual* Spark DataTypes into the same 5 classes so the
schema-types check can compare declared-vs-actual without pandas dtypes.

Declared fixture schemas follow FIXTURES.md §2 (mirroring the reference's
``config/schemas.py:6-89`` table shapes).
"""

from __future__ import annotations

from pyspark.sql import types as T

_EXPLICIT = {
    "varchar": "string", "char": "string", "text": "string",
    "string": "string",
    "integer": "int", "int": "int", "long": "int", "bigint": "int",
    "smallint": "int", "tinyint": "int",
    "double": "float", "real": "float", "float": "float",
    "decimal": "float", "numeric": "float",
    "boolean": "bool", "bool": "bool",
    "timestamp": "datetime", "date": "datetime", "datetime": "datetime",
    "binary": "binary", "array": "array", "map": "map", "struct": "struct",
}


def normalize_type(type_str: str) -> str:
    """Collapse a declared type string to one of the comparison classes.

    Matches reference semantics exactly, including precedence: the
    substring checks (int/float/bool/datetime) run before the explicit
    prefix map, and unknown types default to ``string``.
    """
    if not type_str:
        return type_str
    t = str(type_str).lower().strip()
    if "int" in t:
        return "int"
    if "float" in t or "double" in t or "decimal" in t:
        return "float"
    if "bool" in t:
        return "bool"
    if "date" in t or "time" in t or "stamp" in t:
        return "datetime"
    for prefix, cls in _EXPLICIT.items():
        if t.startswith(prefix):
            return cls
    return "string"


def spark_type_class(dt: T.DataType) -> str:
    """Normalized class of an *actual* Spark type (the introspected side)."""
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "float"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return "datetime"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.ArrayType):
        return "array"
    if isinstance(dt, T.MapType):
        return "map"
    if isinstance(dt, T.StructType):
        return "struct"
    return "string"


# Declared schemas for the reference-shaped fixture tables (FIXTURES.md §2)
# plus the primary webpages input (BASELINE.json input_hint).
TABLE_SCHEMAS: dict[str, dict[str, str]] = {
    "webpages": {
        "url": "string",
        "warc_ts": "timestamp",
        "html": "binary",
        "text": "string",
        "lang": "string",
    },
    "personnes": {
        "date_insertion": "timestamp",
        "nom": "string",
        "prenom": "string",
        "profession": "string",
        "date_de_naissance": "timestamp",
        "age": "int",
    },
    "tva_due": {
        "date_insertion": "timestamp",
        "batch_id": "int",
        "systeme_source": "string",
        "type_import": "string",
        "id_declaration": "string",
        "id_adherent": "string",
        "identifiant_f": "string",
        "raison_sociale": "string",
        "code_declarant": "string",
        "date_depot": "timestamp",
        "type_declaration": "string",
        "exercice": "smallint",
        "id_ligne": "string",
        "credit": "float",
        "resolution": "string",
        "credit_apres": "float",
        "credit_accom": "float",
        "tva_due_per": "float",
        "net_paie": "float",
    },
    "dts_recap": {
        "date_insertion": "timestamp",
        "id_recap": "bigint",
        "exercice": "smallint",
        "periode": "tinyint",
        "montant_du": "decimal(12,2)",
        "montant_paye": "decimal(12,2)",
        "taux": "decimal(5,2)",
        "solde": "decimal(15,2)",
        "code_statut": "string",
    },
}


def get_schema(table: str) -> dict[str, str]:
    return dict(TABLE_SCHEMAS.get(table, {}))
