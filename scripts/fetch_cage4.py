#!/usr/bin/env python
"""Fetch the real cage4.mtx from SuiteSparse into tests/fixtures/.

cage4 (van Heukelum collection, 9x9, 49 nnz) is the reference's
smoke-test fixture (``Source Code/scripts/batch_test.sh:15``). The
development environment here has zero network egress, so the file cannot
be committed verbatim from this machine; run this script anywhere with
network access and commit the result — ``tests/test_io.py::
test_loader_real_cage4`` picks it up automatically (it skips when the
file is absent).

The download is verified structurally (banner, dims, nnz count, row
sums) before being written, so a truncated or substituted file cannot
land in the fixture directory.
"""

import io
import sys
import tarfile
import urllib.request
from pathlib import Path

URL = "https://suitesparse-collection-website.herokuapp.com/MM/vanHeukelum/cage4.tar.gz"
ALT_URL = "https://sparse.tamu.edu/MM/vanHeukelum/cage4.tar.gz"
DEST = Path(__file__).resolve().parent.parent / "tests" / "fixtures" / "cage4.mtx"


def validate(text: str) -> None:
    lines = [ln for ln in text.splitlines() if ln.strip()]
    assert lines[0].startswith("%%MatrixMarket matrix coordinate real"), \
        lines[0]
    body = [ln for ln in lines if not ln.startswith("%")]
    rows, cols, nnz = map(int, body[0].split())
    assert (rows, cols, nnz) == (9, 9, 49), (rows, cols, nnz)
    assert len(body) == 1 + nnz, len(body)
    # cage matrices are Markov transition matrices: row sums == 1.
    sums = [0.0] * rows
    for ln in body[1:]:
        r, c, v = ln.split()
        sums[int(r) - 1] += float(v)
    assert all(abs(s - 1.0) < 1e-12 for s in sums), sums


def main() -> int:
    for url in (URL, ALT_URL):
        try:
            data = urllib.request.urlopen(url, timeout=60).read()
            break
        except Exception as e:  # noqa: BLE001 — try the mirror
            print(f"fetch failed from {url}: {e}", file=sys.stderr)
    else:
        return 1
    with tarfile.open(fileobj=io.BytesIO(data), mode="r:gz") as tf:
        member = next(m for m in tf.getmembers()
                      if m.name.endswith("cage4.mtx"))
        text = tf.extractfile(member).read().decode()
    validate(text)
    DEST.parent.mkdir(parents=True, exist_ok=True)
    DEST.write_text(text)
    print(f"wrote {DEST} ({len(text)} bytes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
