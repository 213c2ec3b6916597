#!/usr/bin/env python
"""Build a PEP 427 wheel for migdar-data-pipelines-spark with the stdlib only.

The build container lacks the `wheel` package (and has no network to fetch
it), so `pip wheel` / `python -m build` / setuptools' `bdist_wheel` all fail
with "invalid command 'bdist_wheel'". A wheel is just a zip with a dist-info
directory, so this script assembles one directly: package tree + METADATA
(core-metadata 2.1, fields read from pyproject.toml via tomllib) + WHEEL +
RECORD (sha256/size per PEP 376). The result installs with a plain
`pip install dist/<name>.whl` — installing a prebuilt wheel needs no build
backend, so the artifact works on machines as constrained as this one.

Usage: python tools/build_wheel.py  ->  dist/migdar_data_pipelines_spark-<v>-py3-none-any.whl
"""

from __future__ import annotations

import base64
import hashlib
import sys
import tomllib
import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
PKG = "migdar_data_pipelines_spark"


def _urlsafe_b64_nopad(digest: bytes) -> str:
    return base64.urlsafe_b64encode(digest).rstrip(b"=").decode()


def build() -> Path:
    meta = tomllib.loads((ROOT / "pyproject.toml").read_text())["project"]
    version = meta["version"]
    dist_name = meta["name"].replace("-", "_")
    tag = "py3-none-any"
    wheel_name = f"{dist_name}-{version}-{tag}.whl"
    dist_info = f"{dist_name}-{version}.dist-info"

    lines = [
        "Metadata-Version: 2.1",
        f"Name: {meta['name']}",
        f"Version: {version}",
        f"Summary: {meta['description']}",
        f"Requires-Python: {meta['requires-python']}",
        "License: " + meta["license"]["text"],
    ]
    for dep in meta.get("dependencies", []):
        lines.append(f"Requires-Dist: {dep}")
    for extra, deps in meta.get("optional-dependencies", {}).items():
        lines.append(f"Provides-Extra: {extra}")
        for dep in deps:
            lines.append(f'Requires-Dist: {dep}; extra == "{extra}"')
    readme = ROOT / "README.md"
    if readme.exists():
        lines += ["Description-Content-Type: text/markdown", "", readme.read_text()]
    metadata = "\n".join(lines) + "\n"

    wheel_file = (
        "Wheel-Version: 1.0\n"
        "Generator: tools/build_wheel.py (stdlib)\n"
        "Root-Is-Purelib: true\n"
        f"Tag: {tag}\n"
    )

    out_dir = ROOT / "dist"
    out_dir.mkdir(exist_ok=True)
    out = out_dir / wheel_name
    record: list[str] = []

    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:

        def add(arcname: str, data: bytes) -> None:
            zf.writestr(arcname, data)
            h = _urlsafe_b64_nopad(hashlib.sha256(data).digest())
            record.append(f"{arcname},sha256={h},{len(data)}")

        pkg_files = sorted(
            p
            for p in (ROOT / PKG).rglob("*.py")
            if "__pycache__" not in p.parts
        )
        if not pkg_files:
            sys.exit(f"no package files under {ROOT / PKG}")
        for p in pkg_files:
            add(str(p.relative_to(ROOT)), p.read_bytes())

        add(f"{dist_info}/METADATA", metadata.encode())
        add(f"{dist_info}/WHEEL", wheel_file.encode())
        add(f"{dist_info}/top_level.txt", f"{PKG}\n".encode())
        record.append(f"{dist_info}/RECORD,,")
        zf.writestr(f"{dist_info}/RECORD", "\n".join(record) + "\n")

    print(out)
    return out


if __name__ == "__main__":
    build()
