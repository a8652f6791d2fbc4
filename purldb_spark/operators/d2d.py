"""Deploy-to-devel (d2d) request intake — the last purldb/urls.py surface.

Reference: matchcode/api.py:454-566 (D2DSerializer.create) registered at
purldb/urls.py:58 (``api_router.register("d2d", D2DViewSet)``). The endpoint
takes a list of ``input_urls`` (package download URLs, conventionally paired
``...#from`` / ``...#to``), verifies each URL is fetchable, creates a
scancode.io project named by a fresh uuid, records one input source per
normalized URL, and queues ONE run of the ``d2d`` pipeline with the literal
group selection ["Java", "Javascript", "Elf", "Go"]
(matchcode/api.py:559-564).

Like the X5 scan boundary, the actual fetch + pipeline execution live in an
external scancode.io service; what belongs to the data plane — and what this
operator models — is the request -> project/run row projection, including
the endpoint's exact validation message and URL-list normalization:

* availability is checked on the RAW input_urls; any failure rejects the
  whole request with ``"Could not fetch: " + "\\n".join(errors)``
  (matchcode/api.py:540-543);
* a url element containing a newline is a textarea submission: the FIRST
  such element contributes the split of input_urls[0] (first list element,
  split on newlines, stripped, blanks dropped); the loop then REBINDS
  ``input_urls`` to that split list (matchcode/api.py:549-556), so every
  LATER newline-bearing element contributes only the first line of the
  first textarea again (splitting ``input_urls[0]`` of the rebound list —
  a single already-stripped line — yields just that line);
* plain elements are stripped and dropped when empty.

The run row carries scancode.io's initial-state constants: status
``not_started``, the d2d pipeline description literal, empty task fields
(matchcode/tests/test_api.py:238-253).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

D2D_PIPELINE = "d2d"
D2D_GROUPS = ["Java", "Javascript", "Elf", "Go"]
D2D_DESCRIPTION = (
    "Establish relationships between two code trees: deployment and development."
)
MSG_COULD_NOT_FETCH = "Could not fetch: "
RUN_NOT_STARTED = "not_started"


def d2d_create(requests: DataFrame) -> DataFrame:
    """Project the d2d request table to response rows.

    ``requests`` columns:
      request_id     long   — caller's key (stands in for the project uuid)
      input_urls     array<string> — the POSTed url list (textarea strings
                                     may embed newlines)
      unreachable    array<string> — the subset check_urls_availability
                                     reports as failed (external boundary,
                                     provided by the fixture/service)

    Output: one row per request —
      request_id, status ('created'|'error'), error, project_name,
      input_sources ('|'-joined), pipeline_name, selected_groups
      (','-joined), run_status, run_description.

    Map-only column expressions — no shuffle; at 100 TB of request logs this
    is a straight projection that fuses into the scan.
    """
    # the reference loop iterates the ORIGINAL list but rebinds input_urls
    # on the first newline element, so later newline elements re-split the
    # rebound list's first entry (one stripped line). Mirror that exactly:
    # split0 = normalized split of the original first element; first_line =
    # its head; the first newline-bearing element (by index) emits split0,
    # any later one emits [first_line].
    split0 = F.filter(
        F.transform(
            F.split(F.element_at(F.col("input_urls"), 1), "\n"),
            # explicit 1-arg lambda: transform would otherwise feed the
            # element INDEX to F.trim's trim-chars arg
            lambda x: F.trim(x),
        ),
        lambda x: x != "",
    )
    first_line = F.element_at(split0, 1)  # null when split0 is empty (the
    # reference raises IndexError there; fixtures keep textareas non-blank)
    first_nl_idx = F.array_min(
        F.filter(
            F.transform(
                F.col("input_urls"),
                lambda e, i: F.when(e.contains("\n"), i),
            ),
            lambda x: x.isNotNull(),
        )
    )
    urls_norm = F.flatten(
        F.transform(
            F.col("input_urls"),
            lambda e, i: F.when(
                e.contains("\n"),
                F.when(i == first_nl_idx, split0).otherwise(
                    F.filter(
                        F.array(first_line),
                        lambda x: x.isNotNull() & (x != ""),
                    )
                ),
            ).otherwise(F.filter(F.array(F.trim(e)), lambda x: x != "")),
        )
    )
    has_error = F.size(F.col("unreachable")) > 0
    return requests.select(
        "request_id",
        F.when(has_error, F.lit("error")).otherwise(F.lit("created")).alias(
            "status"
        ),
        F.when(
            has_error,
            F.concat(
                F.lit(MSG_COULD_NOT_FETCH),
                F.array_join(F.col("unreachable"), "\n"),
            ),
        ).alias("error"),
        F.when(
            ~has_error,
            F.concat(F.lit("d2d-"), F.col("request_id").cast("string")),
        ).alias("project_name"),
        F.when(~has_error, F.array_join(urls_norm, "|")).alias("input_sources"),
        F.when(~has_error, F.lit(D2D_PIPELINE)).alias("pipeline_name"),
        F.when(~has_error, F.lit(",".join(D2D_GROUPS))).alias("selected_groups"),
        F.when(~has_error, F.lit(RUN_NOT_STARTED)).alias("run_status"),
        F.when(~has_error, F.lit(D2D_DESCRIPTION)).alias("run_description"),
    )
