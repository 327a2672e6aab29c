"""Fetch the reference validation dataset (grtcode-data).

Port of the reference's ``download-test-data`` script
(/root/reference/download-test-data): downloads the Zenodo archive that
holds hitran2016.par, the MT-CKD/ozone continuum tables, CFC/CIA cross
sections, the solar flux CSV, and the CIRC / RFMIP-IRF input netCDFs,
then unpacks it next to the repo so the data-gated real-data tests
(tests/test_real_data.py) run.

Usage:  python tools/fetch_test_data.py [dest_dir]
        (default dest: <repo>/grtcode-data; also honored via the
        GRTCODE_DATA environment variable by the tests)

Requires network egress; in a sealed environment this exits with a clear
message and the tests skip.
"""
from __future__ import annotations

import os
import sys
import zipfile

URL = "https://zenodo.org/records/16423657/files/grtcode-data.zip"


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dest = argv[0] if argv else os.path.join(repo, "grtcode-data")
    marker = os.path.join(dest, "HITRAN_files", "hitran2016.par")
    if os.path.exists(marker):
        print(f"already present: {marker}")
        return 0
    zip_path = os.path.join(os.path.dirname(dest), "grtcode-data.zip")
    if not os.path.exists(zip_path):
        print(f"downloading {URL} ...")
        try:
            import urllib.request

            urllib.request.urlretrieve(URL, zip_path)
        except Exception as e:
            print(f"download failed ({e}).\n"
                  f"No network egress? Fetch {URL} elsewhere and place the "
                  f"archive at {zip_path}, then re-run.", file=sys.stderr)
            return 1
    print(f"unpacking {zip_path} -> {dest}")
    with zipfile.ZipFile(zip_path) as z:
        names = z.namelist()
        # The archive may nest everything under a grtcode-data/ root.
        root = names[0].split("/")[0] if names and "/" in names[0] else None
        z.extractall(os.path.dirname(dest))
        if root and root != os.path.basename(dest):
            os.rename(os.path.join(os.path.dirname(dest), root), dest)
    if not os.path.exists(marker):
        print(f"unpacked, but {marker} not found — archive layout "
              f"changed?", file=sys.stderr)
        return 1
    print("done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
