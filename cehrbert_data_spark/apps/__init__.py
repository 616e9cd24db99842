"""CLI apps mirroring the reference's spark-submit surface."""
