"""Live HTTP transport for the Active911 interface (O-1/O-2).

Reproduces the reference's wire protocol (task.ts:245-279 login,
task.ts:124-148 per-agency archived-alert fetch) with the Python stdlib —
no third-party HTTP deps:

- cookie jar spanning login → fetch (the reference's CookieAgent);
- multipart/form-data POSTs (the reference's FormData);
- login body: ``operation=login`` +
  ``post_data={username, password, permanent: 0, timeInitiated}``;
  response: optionally-paren-wrapped JSON whose ``message`` carries the
  JWT and the entitled agency list;
- fetch body: ``operation=get_archived_alerts_spreadsheet`` +
  ``auth=<jwt>`` + ``post_data={agency_id, from_date, to_date,
  file_type: 'Csv'}`` POSTed to ``interface.ajax.php?callback=jQuery<ms>``;
  response: the JSONP payload the decode path unwraps.

``base_url`` is an option (tests point it at a loopback http.server; the
reference's production endpoint is the default). Each Spark partition
performs its own lazy login — logins are per-executor, cookies never
serialize through the plan.
"""

from __future__ import annotations

import http.cookiejar
import json
import re
import time
import urllib.request
import uuid

DEFAULT_BASE_URL = "https://interface.active911.com"

_PAREN_WRAP = re.compile(r"^\(|\)$")


def _encode_multipart(fields: dict[str, str]) -> tuple[bytes, str]:
    """Minimal multipart/form-data encoder (stdlib has none)."""
    boundary = f"----spark-a911-{uuid.uuid4().hex}"
    lines: list[bytes] = []
    for name, value in fields.items():
        lines += [
            f"--{boundary}".encode(),
            f'Content-Disposition: form-data; name="{name}"'.encode(),
            b"",
            str(value).encode("utf-8"),
        ]
    lines += [f"--{boundary}--".encode(), b""]
    return b"\r\n".join(lines), f"multipart/form-data; boundary={boundary}"


class HttpTransport:
    """Drop-in for ``FixtureTransport`` behind the same seam:
    ``login() -> (token, [agency_id])`` and
    ``fetch(agency_id, from_ms, to_ms) -> jsonp_text``."""

    def __init__(
        self,
        username: str,
        password: str,
        base_url: str = DEFAULT_BASE_URL,
        clock=time.time,
        timeout: float = 30.0,
    ):
        self.base_url = base_url.rstrip("/")
        self.username = username
        self.password = password
        self.clock = clock
        self.timeout = timeout
        self._jar = http.cookiejar.CookieJar()
        self._opener = urllib.request.build_opener(
            urllib.request.HTTPCookieProcessor(self._jar)
        )
        self._token: str | None = None

    # -- wire helpers -------------------------------------------------------

    def _post_form(self, url: str, fields: dict[str, str]) -> str:
        body, content_type = _encode_multipart(fields)
        req = urllib.request.Request(
            url,
            data=body,
            method="POST",
            headers={
                "Content-Type": content_type,
                "Origin": self.base_url,
                "Referer": f"{self.base_url}/interface/",
            },
        )
        with self._opener.open(req, timeout=self.timeout) as resp:
            return resp.read().decode("utf-8")

    # -- Transport seam -----------------------------------------------------

    def login(self) -> tuple[str, list[int]]:
        """task.ts:245-279: POST the login form, keep the session cookie,
        return (jwt, entitled agency ids)."""
        text = self._post_form(
            f"{self.base_url}/interface/interface.ajax.php",
            {
                "operation": "login",
                "post_data": json.dumps(
                    {
                        "username": self.username,
                        "password": self.password,
                        "permanent": 0,
                        "timeInitiated": self.clock(),
                    }
                ),
            },
        )
        message = json.loads(_PAREN_WRAP.sub("", text.strip()))["message"]
        if not isinstance(message, dict) or "jwt" not in message:
            raise ValueError(f"login failed: {message}")
        self._token = message["jwt"]
        return self._token, [int(a["id"]) for a in message["agencies"]]

    def fetch(self, agency_id: int, from_ms: int, to_ms: int) -> str:
        """task.ts:124-148: POST the archived-alerts form for one agency's
        time window; returns the raw JSONP text (decode happens in the
        source's per-partition read, same as the fixture path)."""
        if self._token is None:
            self.login()
        callback = f"jQuery{int(self.clock() * 1000)}"
        return self._post_form(
            f"{self.base_url}/interface/interface.ajax.php?callback={callback}",
            {
                "operation": "get_archived_alerts_spreadsheet",
                "auth": self._token,
                "post_data": json.dumps(
                    {
                        "agency_id": agency_id,
                        "from_date": from_ms,
                        "to_date": to_ms,
                        "file_type": "Csv",
                    }
                ),
            },
        )


def default_window_ms(clock=time.time) -> tuple[int, int]:
    """The reference's pull window: (now - 6h, now) in epoch ms
    (task.ts:134-135)."""
    now_ms = int(clock() * 1000)
    return now_ms - 6 * 3600 * 1000, now_ms
