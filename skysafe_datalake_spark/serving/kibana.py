"""Kibana dashboard provisioning (reference S11,
``/root/reference/src/setup_kibana.py:14-59`` and
``dags/setup_kibana_dag.py:32-81``): wait for Kibana's status
endpoint, then one-shot import of the saved-objects NDJSON via the
Saved Objects API (``_import?overwrite=true``, ``kbn-xsrf`` header).

Ops tooling, not an engine operator — but the serving boundary is
config-complete with it: the same transport-injection pattern as
``sources.ingest`` means the readiness/retry/import logic is fully
exercised by fixture transports in tests, and a real deployment just
passes ``ingest.urllib_transport``-style HTTP.

The dashboard NDJSON contract (what the import must contain) is the
reference's: an index-pattern keyed on ``extracted_at`` as the time
field plus the panel definitions over the usage-layer fields
(``risk_category`` colors, ``anomaly_score`` histogram,
``flight_phase`` terms — SURVEY.md §2.12).
"""

from __future__ import annotations

import logging
from collections.abc import Callable
from pathlib import Path

from skysafe_datalake_spark.sources.ingest import HttpError, Transport

logger = logging.getLogger(__name__)

DEFAULT_KIBANA_URL = "http://localhost:5601"
MAX_RETRIES = 12
RETRY_DELAY_SEC = 10.0


def wait_for_kibana(
    transport: Transport,
    *,
    kibana_url: str = DEFAULT_KIBANA_URL,
    max_retries: int = MAX_RETRIES,
    retry_delay_sec: float = RETRY_DELAY_SEC,
    sleep: Callable[[float], None] | None = None,
) -> bool:
    """Poll /api/status until ready (reference setup_kibana.py:14-27).
    ``sleep`` is injectable so tests don't wait wall-clock."""
    import time as _time

    sleep = sleep or _time.sleep
    for attempt in range(1, max_retries + 1):
        try:
            transport("GET", f"{kibana_url}/api/status", timeout=5.0)
            logger.info("Kibana ready (attempt %d)", attempt)
            return True
        except HttpError:
            logger.info(
                "Kibana not ready, retry in %ss (%d/%d)",
                retry_delay_sec, attempt, max_retries,
            )
            sleep(retry_delay_sec)
    return False


def import_dashboard(
    transport: Transport,
    ndjson_path: str | Path,
    *,
    kibana_url: str = DEFAULT_KIBANA_URL,
    overwrite: bool = True,
    wait: bool = True,
    sleep: Callable[[float], None] | None = None,
) -> dict:
    """One-shot saved-objects import (reference setup_kibana.py:30-59).

    Returns the API response dict ({successCount, errors, ...}).
    Raises FileNotFoundError for a missing NDJSON and RuntimeError if
    Kibana never becomes ready — loud failures instead of the
    reference's print-and-return.
    """
    path = Path(ndjson_path)
    if not path.exists():
        raise FileNotFoundError(
            f"{path} not found; export the dashboard from Kibana > "
            "Stack Management > Saved Objects > Export"
        )
    if wait and not wait_for_kibana(
        transport, kibana_url=kibana_url, sleep=sleep
    ):
        raise RuntimeError("Kibana did not become ready; aborting import")

    endpoint = (
        f"{kibana_url}/api/saved_objects/_import"
        f"?overwrite={'true' if overwrite else 'false'}"
    )
    # Kibana's _import API accepts ONLY multipart/form-data file
    # uploads (the reference posts requests files={'file': f}); a
    # form-urlencoded body is rejected outright, so the payload goes
    # through the transport's files= channel and the filename keeps
    # its .ndjson suffix (Kibana validates it).
    result = transport(
        "POST",
        endpoint,
        headers={"kbn-xsrf": "true"},
        files={"file": (path.name, path.read_text())},
        timeout=30.0,
    )
    n_ok = result.get("successCount", 0)
    errors = result.get("errors", [])
    logger.info("dashboard import: %d objects, %d errors", n_ok, len(errors))
    for err in errors[:10]:
        logger.error(
            "  import error: %s — %s",
            err.get("id"), err.get("error", {}).get("message"),
        )
    return result
