from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO = str(Path(__file__).resolve().parent.parent)
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF_SMOKE = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from etl_rust_spark import get_spark

    s = get_spark(app_name="etl-rust-spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def duck(sf_dir):
    from tests.oracle import duck_connect

    con = duck_connect(sf_dir)
    yield con
    con.close()


def _make_self_signed(dirpath: Path, cn: str) -> tuple[str, str]:
    """One self-signed cert + key with SAN localhost/127.0.0.1 via the
    openssl CLI (no cert libs in the container)."""
    import subprocess

    cert, key = dirpath / f"{cn}-cert.pem", dirpath / f"{cn}-key.pem"
    subprocess.run(
        [
            "openssl", "req", "-x509", "-newkey", "rsa:2048",
            "-keyout", str(key), "-out", str(cert),
            "-days", "2", "-nodes", "-subj", f"/CN={cn}",
            "-addext", "subjectAltName=DNS:localhost,IP:127.0.0.1",
        ],
        check=True, capture_output=True,
    )
    return str(cert), str(key)


@pytest.fixture(scope="session")
def tls_certs(tmp_path_factory):
    """(certfile, keyfile) for TLS stub listeners, plus a SECOND
    independent self-signed cert acting as the 'wrong CA' — a client
    trusting it must fail verification against the first."""
    import shutil

    if shutil.which("openssl") is None:
        pytest.skip("openssl CLI not available for test certs")
    d = tmp_path_factory.mktemp("tls")
    cert, key = _make_self_signed(d, "broker")
    wrong_ca, _ = _make_self_signed(d, "other")
    return {"cert": cert, "key": key, "wrong_ca": wrong_ca}
