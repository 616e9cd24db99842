"""Deterministic external-cohort CSV for the feature-extraction golden.

The reference's ``tools/extract_features.py`` consumes a user-supplied
cohort (CSV or parquet) with arbitrary column names and attaches ATT
sequence features from an OMOP folder. This five-member cohort (person 10
contributes twice) uses NON-default column names to exercise the rename
path, with index dates placed mid-record so each member has history
before and events after their index.
"""

from __future__ import annotations

import os

#: (subject, prediction_datetime, outcome)
ROWS = (
    (10, "2018-01-15 00:00:00", 1),
    (10, "2019-05-01 00:00:00", 0),
    (15, "2010-06-01 00:00:00", 0),
    (18, "2017-03-10 00:00:00", 1),
    (19, "2015-11-20 00:00:00", 0),
)


def write_cohort_csv(out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "external_cohort.csv")
    with open(path, "w") as fh:
        fh.write("subject_id,prediction_time,outcome\n")
        for pid, ts, label in ROWS:
            fh.write(f"{pid},{ts},{label}\n")
    return path
