"""D2–D4 + R1/R2 — vocabulary hierarchy operations.

Ancestry is the generic ``transitive_closure`` operator over 'Subsumes' edges
(reference: utils/vocab_utils.py:4-64 runs the same BFS through global_temp
views); the closure-table lookup (R2, :67-89) is a single semi-join. The
rollups (drug→ingredient :92-114, diagnosis→3-digit ICD :117-195, procedure
multi-branch :198-361) join only the DISTINCT concept ids of the fact table
against the vocabulary — the replacement map is tiny and broadcast back, so
the fact table is touched exactly once with a map-side join.

The reference's ``extract_parent_code`` Python UDF (vocab_utils.py:199-202)
is ``F.split(code, '\\.')[0]`` here — JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cehrbert_data_spark.operators.closure import transitive_closure

#: 3-digit ICD concept classes (reference: vocab_utils.py:118-127).
THREE_DIGIT_ICD_CLASSES = [
    "3-char nonbill code",
    "3-dig nonbill code",
    "3-char billing code",
    "3-dig billing code",
    "3-dig billing E code",
    "3-dig billing V code",
    "3-dig nonbill E code",
    "3-dig nonbill V code",
]

CPT4_ROOT_CONCEPT_ID = 45889197


def build_ancestry_table(
    concept_relationship: DataFrame, seed_concept_ids: list[int]
) -> DataFrame:
    """R1: (ancestor_concept_id, descendant_concept_id, distance) closure of
    'Subsumes' edges from the seed set (reference: vocab_utils.py:4-64)."""
    edges = (
        concept_relationship.where(F.col("relationship_id") == "Subsumes")
        .select(
            F.col("concept_id_1").alias("src"), F.col("concept_id_2").alias("dst")
        )
    )
    spark = concept_relationship.sparkSession
    seeds = spark.createDataFrame(
        [(int(c),) for c in seed_concept_ids], "src: long"
    )
    closure = transitive_closure(edges, "src", "dst", seeds=seeds)
    return closure.select(
        F.col("src").alias("ancestor_concept_id"),
        F.col("dst").alias("descendant_concept_id"),
        "distance",
    )


def get_descendant_concepts(
    concept: DataFrame, concept_ancestor: DataFrame, seed_concept_ids: list[int]
) -> DataFrame:
    """R2: descendant concept rows via the precomputed closure table
    (reference: vocab_utils.py:67-89)."""
    return (
        concept_ancestor.where(
            F.col("ancestor_concept_id").isin([int(c) for c in seed_concept_ids])
        )
        .select(F.col("descendant_concept_id").alias("concept_id"))
        .distinct()
        .join(concept, "concept_id")
    )


def roll_up_to_drug_ingredients(
    drug_exposure: DataFrame, concept: DataFrame, concept_ancestor: DataFrame
) -> DataFrame:
    """D2 (reference: vocab_utils.py:92-114): replace drug_concept_id with its
    'Ingredient'-class ancestor when one exists."""
    drug_ingredient = (
        drug_exposure.select("drug_concept_id")
        .distinct()
        .join(concept_ancestor, F.col("drug_concept_id") == F.col("descendant_concept_id"))
        .join(concept, F.col("ancestor_concept_id") == F.col("concept_id"))
        .where(F.col("concept_class_id") == "Ingredient")
        .select(
            F.col("drug_concept_id"), F.col("concept_id").alias("ingredient_concept_id")
        )
    )
    fields = [
        F.coalesce(F.col("ingredient_concept_id"), F.col("drug_concept_id")).alias(
            "drug_concept_id"
        )
    ] + [F.col(c) for c in drug_exposure.columns if c != "drug_concept_id"]
    return drug_exposure.join(
        F.broadcast(drug_ingredient), "drug_concept_id", "left_outer"
    ).select(fields)


def roll_up_diagnosis(
    condition_occurrence: DataFrame, concept: DataFrame, concept_relationship: DataFrame
) -> DataFrame:
    """D3 (reference: vocab_utils.py:117-195): non-SNOMED condition source
    concepts roll up to their 3-digit ICD parent class."""
    condition_icd = (
        condition_occurrence.select("condition_source_concept_id")
        .distinct()
        .join(concept, F.col("condition_source_concept_id") == F.col("concept_id"))
        .where(F.col("domain_id") == "Condition")
        .where(F.col("vocabulary_id") != "SNOMED")
        .select(
            "condition_source_concept_id",
            F.col("vocabulary_id").alias("child_vocabulary_id"),
            F.col("concept_class_id").alias("child_concept_class_id"),
        )
    )
    hierarchy = (
        condition_icd.join(
            concept_relationship, F.col("condition_source_concept_id") == F.col("concept_id_1")
        )
        .join(
            concept,
            (F.col("concept_id_2") == F.col("concept_id"))
            & F.col("concept_class_id").isin(THREE_DIGIT_ICD_CLASSES),
            how="left",
        )
        .select(
            F.col("condition_source_concept_id").alias("source_concept_id"),
            "child_concept_class_id",
            F.col("concept_id").alias("parent_concept_id"),
        )
        .distinct()
        .withColumn(
            "ancestor_concept_id",
            F.when(
                F.col("child_concept_class_id").isin(THREE_DIGIT_ICD_CLASSES),
                F.col("source_concept_id"),
            ).otherwise(F.col("parent_concept_id")),
        )
        .dropna(subset="ancestor_concept_id")
    )
    fields = [
        F.col(c)
        for c in condition_occurrence.columns
        if c != "condition_source_concept_id"
    ] + [
        F.coalesce(F.col("ancestor_concept_id"), F.col("condition_source_concept_id")).alias(
            "condition_source_concept_id"
        )
    ]
    return (
        condition_occurrence.join(
            F.broadcast(hierarchy.select("source_concept_id", "ancestor_concept_id")),
            condition_occurrence["condition_source_concept_id"]
            == F.col("source_concept_id"),
            how="left",
        )
        .select(fields)
        .withColumn("condition_concept_id", F.col("condition_source_concept_id"))
    )


def roll_up_procedure(
    procedure_occurrence: DataFrame, concept: DataFrame, concept_ancestor: DataFrame
) -> DataFrame:
    """D4 (reference: vocab_utils.py:198-361): CPT4 via hierarchy levels, ICD
    via dotted-prefix parent code, ICD10PCS via 3-char prefix, HCPCS identity."""
    procedure_code = (
        procedure_occurrence.select("procedure_source_concept_id")
        .distinct()
        .join(concept, F.col("procedure_source_concept_id") == F.col("concept_id"))
        .where(F.col("domain_id") == "Procedure")
        .select(
            F.col("procedure_source_concept_id").alias("source_concept_id"),
            F.col("vocabulary_id").alias("child_vocabulary_id"),
            F.col("concept_class_id").alias("child_concept_class_id"),
            F.col("concept_code").alias("child_concept_code"),
        )
    )

    # CPT4 branch
    cpt_code = procedure_code.where(F.col("child_vocabulary_id") == "CPT4")
    cpt_hierarchy = (
        cpt_code.join(
            concept_ancestor,
            cpt_code["source_concept_id"] == concept_ancestor["descendant_concept_id"],
        )
        .join(concept, concept_ancestor["ancestor_concept_id"] == concept["concept_id"])
        .where(concept["vocabulary_id"] == "CPT4")
        .select(
            "source_concept_id",
            "child_concept_class_id",
            F.col("ancestor_concept_id").alias("parent_concept_id"),
            "min_levels_of_separation",
            F.col("concept_class_id").alias("parent_concept_class_id"),
        )
    )
    level_1 = (
        cpt_hierarchy.where(F.col("min_levels_of_separation") == 1)
        .where(F.col("child_concept_class_id") == "CPT4")
        .where(F.col("parent_concept_class_id") == "CPT4 Hierarchy")
        .select("source_concept_id", "parent_concept_id")
    )
    level_1 = (
        level_1.join(
            concept_ancestor,
            (level_1["source_concept_id"] == concept_ancestor["descendant_concept_id"])
            & (concept_ancestor["min_levels_of_separation"] == 1),
            how="left",
        )
        .select(
            "source_concept_id",
            "parent_concept_id",
            F.col("ancestor_concept_id").alias("root_concept_id"),
        )
        .withColumn(
            "ancestor_concept_id",
            F.when(
                F.col("root_concept_id") == CPT4_ROOT_CONCEPT_ID, F.col("source_concept_id")
            ).otherwise(F.col("parent_concept_id")),
        )
        .select("source_concept_id", "ancestor_concept_id")
    )
    level_0_ids = (
        cpt_hierarchy.groupBy("source_concept_id")
        .agg(F.max("min_levels_of_separation").alias("max_sep"))
        .where(F.col("max_sep") == 0)
        .select(F.col("source_concept_id").alias("cpt_level_0_concept_id"))
    )
    level_0 = cpt_hierarchy.join(
        level_0_ids,
        cpt_hierarchy["source_concept_id"] == level_0_ids["cpt_level_0_concept_id"],
    ).select(
        "source_concept_id", F.col("parent_concept_id").alias("ancestor_concept_id")
    )
    cpt_rollup = level_1.unionByName(level_0).dropDuplicates()

    # ICD dotted-prefix branch (native split, no UDF)
    icd = procedure_code.where(
        F.col("child_vocabulary_id").isin(["ICD9CM", "ICD9Proc", "ICD10CM"])
    ).withColumn("parent_concept_code", F.split(F.col("child_concept_code"), r"\.")[0])
    icd_map = (
        icd.join(
            concept,
            (icd["parent_concept_code"] == concept["concept_code"])
            & (icd["child_vocabulary_id"] == concept["vocabulary_id"]),
            how="left",
        )
        .select("source_concept_id", F.col("concept_id").alias("ancestor_concept_id"))
        .distinct()
    )

    # ICD10PCS 3-char prefix branch
    pcs = procedure_code.where(F.col("child_vocabulary_id") == "ICD10PCS").withColumn(
        "parent_concept_code", F.substring(F.col("child_concept_code"), 1, 3)
    )
    pcs_map = (
        pcs.join(
            concept,
            (pcs["parent_concept_code"] == concept["concept_code"])
            & (pcs["child_vocabulary_id"] == concept["vocabulary_id"]),
            how="left",
        )
        .select("source_concept_id", F.col("concept_id").alias("ancestor_concept_id"))
        .distinct()
    )

    # HCPCS identity branch
    hcpcs_map = (
        procedure_code.where(F.col("child_vocabulary_id") == "HCPCS")
        .withColumn("ancestor_concept_id", F.col("source_concept_id"))
        .select("source_concept_id", "ancestor_concept_id")
        .distinct()
    )

    hierarchy = (
        cpt_rollup.unionByName(icd_map).unionByName(pcs_map).unionByName(hcpcs_map).distinct()
    )
    fields = [
        F.col(c)
        for c in procedure_occurrence.columns
        if c != "procedure_source_concept_id"
    ] + [
        F.coalesce(F.col("ancestor_concept_id"), F.col("procedure_source_concept_id")).alias(
            "procedure_source_concept_id"
        )
    ]
    return (
        procedure_occurrence.join(
            F.broadcast(hierarchy),
            procedure_occurrence["procedure_source_concept_id"]
            == hierarchy["source_concept_id"],
            how="left",
        )
        .select(fields)
        .withColumn("procedure_concept_id", F.col("procedure_source_concept_id"))
    )
