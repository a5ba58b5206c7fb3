"""osinfo_rpm source — installed-package inventory of an RPM system as a
cube (reference ``metrique/cubes/osinfo/rpm.py:79-117``, ``Rpm.get_objects``).

The reference shells out ``rpm -qa --queryformat`` locally or over
paramiko-ssh and builds one object per package. Here the extraction is the
same driver-side shell-out (host inventories are tiny — thousands of rows);
the result is immediately a DataFrame so it can be ``upsert``-ed into a
temporal cube like any other source. ssh stays import-gated: paramiko is
optional exactly as in the reference (``rpm.py:22-27``).
"""

from __future__ import annotations

import datetime as _dt
import shlex
import socket
import subprocess
from typing import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# reference FIELDS, rpm.py:35-37
FIELDS = ["name", "version", "release", "arch", "nvra", "license",
          "os", "packager", "platform", "sourcepackage", "sourcerpm",
          "summary"]

SEP = ":::"


def _local_cmd(fmt: str) -> str:
    cmd = shlex.split(f"rpm -qa --queryformat '{fmt}\\n'")
    return subprocess.check_output(cmd).decode("utf-8")


def _ssh_cmd(fmt: str, host: str, user: str | None, password: str | None) -> str:
    try:
        import paramiko  # type: ignore
    except ImportError as e:  # pragma: no cover - optional dep
        raise ImportError("`pip install paramiko` required!") from e
    ssh = paramiko.SSHClient()
    ssh.load_system_host_keys()
    ssh.connect(host, username=user, password=password)
    _, stdout, _ = ssh.exec_command(f"rpm -qa --queryformat '{fmt}'")
    return "".join(stdout.readlines())


def parse_rpm_output(
    output: str | Iterable[str],
    fields: list[str],
    host: str,
    now: _dt.datetime,
) -> list[dict]:
    """Lines of ``:::``-joined queryformat values → one dict per package
    (reference ``rpm.py:106-117``): ``(none)`` → None, ``_oid`` =
    ``host__nvra``, ``_start`` = extraction time."""
    lines = output.strip().split("\n") if isinstance(output, str) else list(output)
    out = []
    for line in lines:
        parts = line.strip().split(SEP)
        if not line.strip():
            continue
        obj: dict = {"host": host, "_start": now, "_end": None}
        for i, item in enumerate(parts[: len(fields)]):
            obj[fields[i]] = None if item == "(none)" else item
        obj["_oid"] = f"{host}__{obj.get('nvra')}"
        out.append(obj)
    return out


def rpm_packages(
    spark: SparkSession,
    fields: list[str] | None = None,
    ssh_host: str | None = None,
    ssh_user: str | None = None,
    ssh_pass: str | None = None,
    _runner: Callable[[str], str] | None = None,
) -> DataFrame:
    """Extract installed-RPM details into a DataFrame (reference
    ``Rpm.get_objects``, ``rpm.py:79-117``).

    ``_runner`` injects the command executor for tests / hosts without
    ``rpm``; it receives the queryformat string and returns raw output.
    """
    fields = list(fields or FIELDS)
    fmt = SEP.join(f"%{{{f}}}" for f in fields)
    if _runner is not None:
        output = _runner(fmt)
    elif ssh_host:
        output = _ssh_cmd(fmt, ssh_host, ssh_user, ssh_pass)
    else:
        output = _local_cmd(fmt)
    host = ssh_host or socket.gethostname()
    now = _dt.datetime.now(_dt.timezone.utc).replace(tzinfo=None)
    records = parse_rpm_output(output, fields, host, now)
    if not records:
        raise RuntimeError("no objects extracted!")
    schema = T.StructType(
        [T.StructField("host", T.StringType()),
         T.StructField("_start", T.TimestampType()),
         T.StructField("_end", T.TimestampType())]
        + [T.StructField(f, T.StringType()) for f in fields]
        + [T.StructField("_oid", T.StringType())]
    )
    return spark.createDataFrame(records, schema)
