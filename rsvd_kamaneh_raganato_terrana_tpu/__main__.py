"""Unified CLI dispatcher.

  python -m rsvd_kamaneh_raganato_terrana_tpu rsvd <mtx-or-dir> [...]
  python -m rsvd_kamaneh_raganato_terrana_tpu image <img> [...]
  python -m rsvd_kamaneh_raganato_terrana_tpu pca <dataset> [yes|no] [...]
  python -m rsvd_kamaneh_raganato_terrana_tpu pod <pod.txt> <prm> [...]
"""

import sys


def main():
    if len(sys.argv) < 2 or sys.argv[1] in ("-h", "--help"):
        print(__doc__)
        return 0
    app, rest = sys.argv[1], sys.argv[2:]
    if app == "rsvd":
        from rsvd_kamaneh_raganato_terrana_tpu.apps.rsvd_main import main as m
    elif app == "image":
        from rsvd_kamaneh_raganato_terrana_tpu.apps.image_main import main as m
    elif app == "pca":
        from rsvd_kamaneh_raganato_terrana_tpu.apps.pca_main import main as m
    elif app == "pod":
        from rsvd_kamaneh_raganato_terrana_tpu.apps.pod_main import main as m
    else:
        print(f"unknown app {app!r}; expected rsvd|image|pca|pod")
        return 1
    m(rest)
    return 0


if __name__ == "__main__":
    sys.exit(main())
