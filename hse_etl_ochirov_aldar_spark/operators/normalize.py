"""Semi-structured payload normalization (SURVEY.md Q10: S3, S4, J4, F8,
F10).

Reference semantics (HW-2): a Postgres table stores a JSON payload
(pets with optional favFoods arrays) and an XML payload (nutrition
facts: daily-values with unit attributes, foods with attributed
children). Driver Python parses them row-at-a-time and INSERTs into
normalized tables (sources_to_linear.py:44-168).

Spark-first: schema'd ``from_json`` / ``from_xml`` (JVM-side parsing,
no Python), ``explode`` fan-out for child tables (J4), surrogate keys
via ``row_number`` over a deterministic ordering (SERIAL analogue).
XML attributes surface as ``_attr`` struct fields per spark-xml
convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

PETS_SCHEMA = T.StructType(
    [
        T.StructField(
            "pets",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("name", T.StringType()),
                        T.StructField("species", T.StringType()),
                        T.StructField("favFoods", T.ArrayType(T.StringType())),
                        T.StructField("birthYear", T.IntegerType()),
                        T.StructField("photo", T.StringType()),
                    ]
                )
            ),
        )
    ]
)


def normalize_pets_json(payloads: DataFrame, payload_col: str = "payload") -> tuple[DataFrame, DataFrame]:
    """JSON pets payload -> (pets, pet_favfoods) normalized tables.

    - pets: pet_id (surrogate, dense by array position), name, species,
      birth_year, fav_foods_joined (F8 ';'.join analogue via concat_ws)
    - pet_favfoods: (pet_id, food) one row per favFoods element —
      missing favFoods (optional field) yields no child rows.
    """
    parsed = payloads.select(
        F.from_json(F.col(payload_col), PETS_SCHEMA).alias("doc")
    )
    exploded = parsed.select(
        F.posexplode(F.col("doc.pets")).alias("pos", "pet")
    )
    w = Window.orderBy("pos")
    pets = exploded.select(
        F.row_number().over(w).alias("pet_id"),
        F.col("pet.name").alias("name"),
        F.col("pet.species").alias("species"),
        F.col("pet.birthYear").alias("birth_year"),
        F.concat_ws(";", F.col("pet.favFoods")).alias("fav_foods_joined"),
        F.col("pet.favFoods").alias("fav_foods"),
    )
    favfoods = pets.select(
        "pet_id", F.explode("fav_foods").alias("food")
    )
    return pets.drop("fav_foods"), favfoods


NUTRITION_XML_SCHEMA = """
    daily_values STRUCT<
        total_fat: STRUCT<_units: STRING, _VALUE: BIGINT>,
        sodium: STRUCT<_units: STRING, _VALUE: BIGINT>
    >,
    food ARRAY<STRUCT<
        name: STRING,
        serving: STRUCT<_units: STRING, _VALUE: BIGINT>,
        calories: STRUCT<_total: BIGINT, _fat: BIGINT>,
        vitamins: STRUCT<a: BIGINT, c: BIGINT>
    >>
"""


def normalize_nutrition_xml(payloads: DataFrame, payload_col: str = "payload") -> tuple[DataFrame, DataFrame]:
    """XML nutrition payload -> (foods, daily_values) tables (F10).

    Attributes (units/total/fat) surface as ``_attr`` fields of the
    parsed structs; element text of an attributed leaf is ``_VALUE``.
    """
    parsed = payloads.select(
        F.from_xml(F.col(payload_col), NUTRITION_XML_SCHEMA).alias("doc")
    )
    foods = parsed.select(F.posexplode("doc.food").alias("pos", "f")).select(
        F.row_number().over(Window.orderBy("pos")).alias("food_id"),
        F.col("f.name").alias("name"),
        F.col("f.serving._VALUE").alias("serving_amount"),
        F.col("f.serving._units").alias("serving_units"),
        F.col("f.calories._total").alias("calories_total"),
        F.col("f.calories._fat").alias("calories_fat"),
        F.col("f.vitamins.a").alias("vitamin_a"),
        F.col("f.vitamins.c").alias("vitamin_c"),
    )
    daily_values = parsed.select(
        F.col("doc.daily_values.total_fat._VALUE").alias("total_fat"),
        F.col("doc.daily_values.total_fat._units").alias("total_fat_units"),
        F.col("doc.daily_values.sodium._VALUE").alias("sodium"),
        F.col("doc.daily_values.sodium._units").alias("sodium_units"),
    )
    return foods, daily_values
