"""OMOP CDM pipeline layer: the reference's clinical capabilities (SURVEY.md
§2.12 D1–D12) re-expressed on the generic operator library.

Modules:
  const       — artificial tokens, priorities, domain registries
  events      — D1 canonical event standardization, visit-id hygiene
  decorators  — D7 decorator chain (clinical / ATT / death / demographic)
  sequence    — sequence assembly (collect-sort-explode) + concept frequency
  visits      — D5 artificial visits, D6 sessionized visit consolidation
  vocab       — D2–D4 concept rollups + ancestry (R1/R2)
  cohort      — D8 templated-SQL cohort framework + labeled outcome joins
"""
