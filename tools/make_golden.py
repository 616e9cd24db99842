"""Regenerate every committed golden fixture from the REFERENCE's own code.

The fixtures under ``tests/fixtures/golden/`` are outputs of the reference
pipeline (/root/reference) run on its bundled 22-person OMOP sample — or, for
the cohorts the raw sample can't support, on the deterministic augmented copy
built by ``tests/augmented_sample.py``. This tool is the committed record of
exactly how each fixture was produced, so any of them can be regenerated (and
therefore audited) from scratch:

    python tools/make_golden.py list
    python tools/make_golden.py training day_day
    python tools/make_golden.py cohort readmission_pw1000
    python tools/make_golden.py all            # everything, sequentially

Add ``--check`` to regenerate into a temp dir and DIFF against the committed
fixture instead of overwriting it — proves the recipe reproduces what's
committed without touching it.

The reference pins pyspark 3.1 but executes correctly under this
environment's Spark 4 once Spark-3-era semantics are restored via
spark-defaults (ANSI off, LEGACY time parser, ambiguous-self-join check off —
see ROUND_NOTES.md round 5). Reference runs are deterministic across local
parallelism on this input (verified local[8] vs local[4]).

Cohort fixtures run with the reference's DEFAULT feature flags, which route
through its legacy ``create_sequence_data`` representation (columns orders /
dates / ages / concept_ids / visit_segments ...). The ATT-feature cohort path
(``is_new_patient_representation``) trips a MISSING_ATTRIBUTES resolution
error in the reference's own dataframe surgery under Spark 4 and cannot be
pinned this way; ATT-token parity is pinned by the training goldens instead.
The cohort golden tests compare the LABEL columns only.

Run this tool only while no other Spark JVM is active (single-box rule).
"""

from __future__ import annotations

import glob
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_SRC = "/root/reference/src"
SAMPLE = "/root/reference/sample_data/omop_sample"
GOLDEN_DIR = os.path.join(REPO, "tests", "fixtures", "golden")

SPARK_DEFAULTS = """
spark.master local[8]
spark.driver.memory 12g
spark.sql.shuffle.partitions 8
spark.sql.ansi.enabled false
spark.sql.legacy.timeParserPolicy LEGACY
spark.sql.analyzer.failAmbiguousSelfJoin false
spark.ui.enabled false
"""

#: fixture dir -> (att_type, inpatient_att_type, extra CLI flags)
TRAINING_FIXTURES = {
    "day_day": ("day", "day", []),
    "cehrbert_mix": ("cehr_bert", "mix", []),
    "cehrbert_mix_artificial": (
        "cehr_bert", "mix", ["--should_construct_artificial_visits"],
    ),
    "week_month": ("week", "month", []),
}

#: volume variants (round-9, VERDICT r8 ask 4): the same decorator configs
#: replayed on the 110-person volume sample (tests/volume_sample.py) —
#: member-id ordering and ATT insertion are where volume breaks sequence
#: assembly, the same class of bug the cohort volume goldens caught
#: (string-vs-numeric person ordering)
TRAINING_VOLUME_FIXTURES = {
    "day_day_volume": ("day", "day", [], "volume"),
    "cehrbert_mix_volume": ("cehr_bert", "mix", [], "volume"),
    "cehrbert_mix_artificial_volume": (
        "cehr_bert", "mix", ["--should_construct_artificial_visits"], "volume",
    ),
}

#: extra flag variants replayed on the cehr_bert/mix config (age-group
#: buckets instead of exact ages; visit type kept but VS/VE tokens dropped)
TRAINING_FLAG_FIXTURES = {
    "cehrbert_mix_agegroup_novs": (
        "cehr_bert", "mix", ["--use_age_group", "-ev"],
    ),
    # measurement domain included (runs on the AUGMENTED sample, which has a
    # measurement table): pins numeric-value tokens / concept-value masks
    "day_day_measurement": (
        "day", "day",
        ["--domain_table_list", "condition_occurrence", "drug_exposure",
         "procedure_occurrence", "measurement"],
        "augmented",
    ),
}

#: fixture dir -> (reference app module, cohort_name, input kind, extra flags)
COHORT_FIXTURES = {
    "readmission_pw1000": (
        "cehrbert_data.prediction_cohorts.readmission", "readmission", "sample",
        ["-ow", "360", "-pw", "1000"],
    ),
    "hospitalization_pw720": (
        "cehrbert_data.prediction_cohorts.hospitalization", "hospitalization", "sample",
        ["-ow", "360", "-hw", "180", "-pw", "720"],
    ),
    "hosp_mortality_aug_pw360": (
        "cehrbert_data.prediction_cohorts.hospitalization_mortality",
        "hospitalization_mortality", "augmented",
        ["-ow", "360", "-pw", "360"],
    ),
    "home_death_aug_pw360": (
        "cehrbert_data.prediction_cohorts.discharge_home_death",
        "discharge_home_death", "augmented",
        ["-ow", "360", "-pw", "360"],
    ),
    "hf_readmission_aug_pw360": (
        "cehrbert_data.prediction_cohorts.hf_readmission",
        "hf_readmission", "augmented",
        ["-ow", "360", "-pw", "360"],
    ),
    "copd_readmission_aug_pw1800": (
        "cehrbert_data.prediction_cohorts.copd_readmission",
        "copd_readmission", "augmented",
        ["-ow", "360", "-pw", "1800"],
    ),
    "afib_stroke_aug_pw720": (
        "cehrbert_data.prediction_cohorts.afib_ischemic_stroke",
        "afib_ischemic_stroke", "augmented",
        ["-ow", "360", "-pw", "720"],
    ),
    "cad_cabg_aug_pw720": (
        "cehrbert_data.prediction_cohorts.cad_cabg_cohort",
        "cad_cabg", "augmented",
        ["-ow", "360", "-pw", "720"],
    ),
    # -dl repeats: argparse keeps the last occurrence, overriding the base
    # 1985 bound so person 17's 1960s-era indexes stay in range
    "t2dm_hf_aug_pw2000": (
        "cehrbert_data.prediction_cohorts.t2dm_hf_cohort",
        "t2dm_hf", "augmented",
        ["-ow", "360", "-pw", "2000", "-dl", "1960-01-01"],
    ),
    "covid_death_aug_pw30": (
        "cehrbert_data.prediction_cohorts.covid_death",
        "covid_death", "augmented",
        ["-ow", "360", "-pw", "30"],
    ),
    "cad_hf_aug_pw1500": (
        "cehrbert_data.prediction_cohorts.cad_hf_cohort",
        "cad_hf", "augmented",
        ["-ow", "360", "-pw", "1500"],
    ),
    "covid_vent_aug_pw30": (
        "cehrbert_data.prediction_cohorts.covid_ventilation",
        "covid_ventilation", "augmented",
        ["-ow", "360", "-pw", "30"],
    ),
    # label-engine flag variants on the raw sample
    "readmission_unbounded": (
        "cehrbert_data.prediction_cohorts.readmission", "readmission", "sample",
        ["-ow", "360", "--is_prediction_window_unbounded"],
    ),
    "readmission_single_pw1000": (
        "cehrbert_data.prediction_cohorts.readmission", "readmission", "sample",
        ["-ow", "360", "-pw", "1000", "--single_contribution"],
    ),
    # VOLUME fixtures: the 110-person key-shifted replication
    # (tests/volume_sample.py) — pins member-id assignment order over many
    # string-sorted persons and any cross-person leakage at volume
    "readmission_vol_pw1000": (
        "cehrbert_data.prediction_cohorts.readmission", "readmission", "volume",
        ["-ow", "360", "-pw", "1000"],
    ),
    "hosp_mortality_vol_pw360": (
        "cehrbert_data.prediction_cohorts.hospitalization_mortality",
        "hospitalization_mortality", "volume",
        ["-ow", "360", "-pw", "360"],
    ),
    "hf_readmission_vol_pw360": (
        "cehrbert_data.prediction_cohorts.hf_readmission",
        "hf_readmission", "volume",
        ["-ow", "360", "-pw", "360"],
    ),
    # round-8: the remaining 9 prediction pairs at volume — every pair in
    # the library now has a 110-person member-for-member golden
    "hospitalization_vol_pw720": (
        "cehrbert_data.prediction_cohorts.hospitalization", "hospitalization",
        "volume",
        ["-ow", "360", "-hw", "180", "-pw", "720"],
    ),
    "home_death_vol_pw360": (
        "cehrbert_data.prediction_cohorts.discharge_home_death",
        "discharge_home_death", "volume",
        ["-ow", "360", "-pw", "360"],
    ),
    "copd_readmission_vol_pw1800": (
        "cehrbert_data.prediction_cohorts.copd_readmission",
        "copd_readmission", "volume",
        ["-ow", "360", "-pw", "1800"],
    ),
    "afib_stroke_vol_pw720": (
        "cehrbert_data.prediction_cohorts.afib_ischemic_stroke",
        "afib_ischemic_stroke", "volume",
        ["-ow", "360", "-pw", "720"],
    ),
    "cad_cabg_vol_pw720": (
        "cehrbert_data.prediction_cohorts.cad_cabg_cohort",
        "cad_cabg", "volume",
        ["-ow", "360", "-pw", "720"],
    ),
    "t2dm_hf_vol_pw2000": (
        "cehrbert_data.prediction_cohorts.t2dm_hf_cohort",
        "t2dm_hf", "volume",
        ["-ow", "360", "-pw", "2000", "-dl", "1960-01-01"],
    ),
    "covid_death_vol_pw30": (
        "cehrbert_data.prediction_cohorts.covid_death",
        "covid_death", "volume",
        ["-ow", "360", "-pw", "30"],
    ),
    "cad_hf_vol_pw1500": (
        "cehrbert_data.prediction_cohorts.cad_hf_cohort",
        "cad_hf", "volume",
        ["-ow", "360", "-pw", "1500"],
    ),
    "covid_vent_vol_pw30": (
        "cehrbert_data.prediction_cohorts.covid_ventilation",
        "covid_ventilation", "volume",
        ["-ow", "360", "-pw", "30"],
    ),
}


#: fixture dir -> (module, extra argv, [(output subdir, fixture filename)]).
#: Every app takes -i/--input_folder SAMPLE and -o/--output_folder.
APP_FIXTURES = {
    "concept_list_min2": (
        "cehrbert_data.apps.generate_included_concept_list",
        ["--min_num_of_patients", "2"],
        [("qualified_concept_list", "qualified_concept_list.parquet")],
    ),
    "connect_visit_default": (
        "cehrbert_data.tools.connect_omop_visit",
        [],
        [
            ("visit_occurrence", "visit_occurrence.parquet"),
            ("visit_mapping", "visit_mapping.parquet"),
        ],
    ),
}


def make_app(fixture: str) -> None:
    module, extra, outputs = APP_FIXTURES[fixture]
    with tempfile.TemporaryDirectory() as workdir:
        out = os.path.join(workdir, "out")
        os.makedirs(out)
        _run_reference(
            ["-m", module, "--input_folder", SAMPLE, "--output_folder", out, *extra],
            workdir,
        )
        for idx, (subdir, filename) in enumerate(outputs):
            _commit_fixture(
                os.path.join(out, subdir, "*.parquet"),
                fixture, filename, replace=(idx == 0),
            )


FEATURES_FIXTURE = "extract_features_ext"


def make_features() -> None:
    """ATT feature extraction for an EXTERNAL cohort (tools/extract_features.py
    -ip): the one path that exercises create_sequence_data_with_att against a
    user-supplied cohort — and, unlike the prediction-cohort apps' feature
    step, it executes cleanly under Spark 4."""
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from feature_cohort import write_cohort_csv

    with tempfile.TemporaryDirectory() as workdir:
        csv_path = write_cohort_csv(workdir)
        out = os.path.join(workdir, "out")
        os.makedirs(out)
        _run_reference(
            [
                "-m", "cehrbert_data.tools.extract_features",
                "-c", "ext_cohort",
                "-i", SAMPLE, "-o", out,
                "-dl", "1985-01-01", "-du", "2023-12-31",
                "--cohort_dir", csv_path,
                "--person_id_column", "subject_id",
                "--index_date_column", "prediction_time",
                "--label_column", "outcome",
                "-ow", "730",
                "--ehr_table_list",
                "condition_occurrence", "drug_exposure", "procedure_occurrence",
                "--att_type", "day", "--inpatient_att_type", "day",
                "-iv", "--include_inpatient_hour_token", "-ip",
            ],
            workdir,
        )
        _commit_fixture(
            os.path.join(out, "ext_cohort", "task_labels", "*.parquet"),
            FEATURES_FIXTURE, "task_labels.parquet",
        )


EHRSHOT_FIXTURE = "ehrshot_small"
#: tables the reference writes BEFORE its Spark-4 measurement crash (the
#: MISSING_ATTRIBUTES dataframe-surgery failure also seen on the ATT cohort
#: feature path); measurement/extract_value parity is unit-pinned instead
EHRSHOT_TABLES = ("person", "visit_occurrence", "condition_occurrence", "drug_exposure")


#: the 120-patient volume export: stresses minted-id assignment order
#: (string-vs-int patient ordering only diverges past one digit) and the
#: disconnect / duplicate-dedup / inferred-inpatient paths interleaved
#: across many patients — see tests/ehrshot_sample.py volume_events
EHRSHOT_VOLUME_FIXTURE = "ehrshot_volume"


def make_ehrshot(volume: bool = False) -> None:
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from ehrshot_sample import EVENTS, build_ehrshot_input, volume_events

    fixture = EHRSHOT_VOLUME_FIXTURE if volume else EHRSHOT_FIXTURE
    events = volume_events() if volume else EVENTS
    with tempfile.TemporaryDirectory() as workdir:
        csv_path, vocab_dir = build_ehrshot_input(
            os.path.join(workdir, "input"), events=events
        )
        out = os.path.join(workdir, "out")
        os.makedirs(out)
        try:
            _run_reference(
                [
                    "-m", "cehrbert_data.tools.ehrshot_to_omop",
                    "--ehr_shot_file", csv_path,
                    "--vocabulary_folder", vocab_dir,
                    "--output_folder", out,
                    "--refresh_ehrshot",
                ],
                workdir,
            )
        except subprocess.CalledProcessError:
            # expected: the measurement branch trips Spark 4's
            # MISSING_ATTRIBUTES resolution bug AFTER the tables below exist
            pass
        for idx, table in enumerate(EHRSHOT_TABLES):
            _commit_fixture(
                os.path.join(out, table, "*.parquet"),
                fixture, f"{table}.parquet", replace=(idx == 0),
            )


def _run_reference(argv: list[str], workdir: str) -> None:
    conf_dir = os.path.join(workdir, "spark-conf")
    os.makedirs(conf_dir, exist_ok=True)
    with open(os.path.join(conf_dir, "spark-defaults.conf"), "w") as f:
        f.write(SPARK_DEFAULTS)
    env = dict(
        os.environ,
        PYTHONPATH=REF_SRC,
        SPARK_CONF_DIR=conf_dir,
    )
    subprocess.run([sys.executable, *argv], env=env, check=True, cwd=workdir)


def _input_folder(kind: str, workdir: str) -> str:
    if kind == "sample":
        return SAMPLE
    sys.path.insert(0, os.path.join(REPO, "tests"))
    if kind == "volume":
        from volume_sample import build_volume_sample

        return build_volume_sample(os.path.join(workdir, "volume_sample"))
    from augmented_sample import build_augmented_sample

    return build_augmented_sample(os.path.join(workdir, "augmented_sample"))


CHECK_MODE = False


def _commit_fixture(src_glob: str, fixture: str, filename: str, replace: bool = True) -> None:
    import duckdb

    parts = sorted(glob.glob(src_glob))
    if not parts:
        raise SystemExit(f"reference produced no parquet at {src_glob}")
    files = "[" + ", ".join(f"'{p}'" for p in parts) + "]"
    n = duckdb.sql(f"SELECT count(*) FROM read_parquet({files})").fetchone()[0]
    if CHECK_MODE:
        # compare against THIS output's committed file only — fixtures like
        # connect_visit_default commit several tables into one directory
        committed = sorted(glob.glob(os.path.join(GOLDEN_DIR, fixture, filename)))
        if not committed:
            raise SystemExit(f"--check: no committed fixture {fixture}/{filename}")
        cfiles = "[" + ", ".join(f"'{p}'" for p in committed) + "]"
        nc = duckdb.sql(f"SELECT count(*) FROM read_parquet({cfiles})").fetchone()[0]
        # order-insensitive full-row diff in both directions
        diff = duckdb.sql(
            f"SELECT count(*) FROM ("
            f"(SELECT * FROM read_parquet({files}) EXCEPT ALL"
            f" SELECT * FROM read_parquet({cfiles}))"
            f" UNION ALL "
            f"(SELECT * FROM read_parquet({cfiles}) EXCEPT ALL"
            f" SELECT * FROM read_parquet({files})))"
        ).fetchone()[0]
        status = "MATCH" if (diff == 0 and n == nc) else "DIFF"
        print(f"--check {fixture}/{filename}: regenerated {n} rows vs committed {nc}; "
              f"row-level mismatches: {diff} -> {status}")
        if status != "MATCH":
            raise SystemExit(1)
        return
    dest = os.path.join(GOLDEN_DIR, fixture)
    if replace:
        shutil.rmtree(dest, ignore_errors=True)
    os.makedirs(dest, exist_ok=True)
    duckdb.sql(
        f"COPY (SELECT * FROM read_parquet({files})) TO "
        f"'{os.path.join(dest, filename)}' (FORMAT PARQUET)"
    )
    print(f"committed {fixture}/{filename}: {n} rows")


def make_training(fixture: str) -> None:
    cfg = {**TRAINING_FIXTURES, **TRAINING_VOLUME_FIXTURES, **TRAINING_FLAG_FIXTURES}[fixture]
    att, inpatient_att, extra = cfg[0], cfg[1], cfg[2]
    input_kind = cfg[3] if len(cfg) > 3 else "sample"
    with tempfile.TemporaryDirectory() as workdir:
        out = os.path.join(workdir, "out")
        os.makedirs(out)
        input_folder = _input_folder(input_kind, workdir)
        _run_reference(
            [
                "-m", "cehrbert_data.apps.generate_training_data",
                "--input_folder", input_folder, "--output_folder", out,
                "--domain_table_list",
                "condition_occurrence", "drug_exposure", "procedure_occurrence",
                "-d", "1985-01-01",
                "-iv", "-ip",
                "--gpt_patient_sequence",
                "--apply_age_filter",
                "--include_inpatient_hour_token",
                "--with_drug_rollup",
                "--att_type", att,
                "--inpatient_att_type", inpatient_att,
                *extra,
            ],
            workdir,
        )
        _commit_fixture(
            os.path.join(out, "patient_sequence", "*.parquet"),
            fixture, "patient_sequence.parquet",
        )


def make_cohort(fixture: str) -> None:
    module, cohort_name, input_kind, extra = COHORT_FIXTURES[fixture]
    with tempfile.TemporaryDirectory() as workdir:
        out = os.path.join(workdir, "out")
        os.makedirs(out)
        input_folder = _input_folder(input_kind, workdir)
        _run_reference(
            [
                "-m", module,
                "-c", cohort_name,
                "-i", input_folder, "-o", out,
                "-dl", "1985-01-01", "-du", "2023-12-31",
                "-l", "0", "-u", "100",
                "-ps", "0",
                *extra,
            ],
            workdir,
        )
        _commit_fixture(
            os.path.join(out, cohort_name.replace("-", "_"), "data", "*.parquet"),
            fixture, "cohort.parquet",
        )


def main() -> None:
    global CHECK_MODE
    if "--check" in sys.argv:
        sys.argv.remove("--check")
        CHECK_MODE = True
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help", "list"):
        print(__doc__)
        print("training fixtures:", ", ".join({**TRAINING_FIXTURES, **TRAINING_VOLUME_FIXTURES, **TRAINING_FLAG_FIXTURES}))
        print("cohort fixtures:  ", ", ".join(COHORT_FIXTURES))
        return
    cmd = sys.argv[1]
    if cmd == "all":
        for f in {**TRAINING_FIXTURES, **TRAINING_VOLUME_FIXTURES, **TRAINING_FLAG_FIXTURES}:
            make_training(f)
        for f in COHORT_FIXTURES:
            make_cohort(f)
        for f in APP_FIXTURES:
            make_app(f)
        make_ehrshot()
        make_ehrshot(volume=True)
        make_features()
    elif cmd == "training":
        make_training(sys.argv[2])
    elif cmd == "cohort":
        make_cohort(sys.argv[2])
    elif cmd == "app":
        make_app(sys.argv[2])
    elif cmd == "ehrshot":
        make_ehrshot()
    elif cmd == "ehrshot_volume":
        make_ehrshot(volume=True)
    elif cmd == "features":
        make_features()
    else:
        raise SystemExit(f"unknown subcommand {cmd!r}")


if __name__ == "__main__":
    main()
