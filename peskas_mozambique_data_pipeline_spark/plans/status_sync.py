"""Validation-status synchronization (E2 tail): decide which
submissions to (re)mark approved / not-approved upstream, never
overwriting a human's manual decision.

Mirrors R/validation.R:1021-1120: flagged ids minus manually-approved
go to 'not_approved'; clean ids minus already-approved go to
'approved'; statuses set by a non-system user are immutable from the
pipeline's side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.joins import anti_join

SYSTEM_USER = "pipeline"


def resolve_status_changes(
    flags: DataFrame,
    statuses: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """Compute (to_approve, to_reject) id sets.

    ``flags``: (submission_id, alert_flag) — NULL alert_flag = clean.
    ``statuses``: (submission_id, validation_status, validated_by) —
    the remote state fetched via ``io.connectors.rate_limited_status_fetch``.
    """
    manual = statuses.filter(
        (F.col("validated_by").isNotNull()) & (F.col("validated_by") != SYSTEM_USER)
    ).select("submission_id")

    flagged = flags.filter(F.col("alert_flag").isNotNull()).select("submission_id")
    clean = flags.filter(F.col("alert_flag").isNull()).select("submission_id")

    already_rejected = statuses.filter(
        F.col("validation_status") == "validation_status_not_approved"
    ).select("submission_id")
    already_approved = statuses.filter(
        F.col("validation_status") == "validation_status_approved"
    ).select("submission_id")

    # setdiff chains (R/validation.R:1035-1079): never touch manual
    # decisions, never resend an unchanged status
    to_reject = anti_join(anti_join(flagged, manual, "submission_id"),
                          already_rejected, "submission_id")
    to_approve = anti_join(anti_join(clean, manual, "submission_id"),
                           already_approved, "submission_id")
    return to_approve, to_reject
