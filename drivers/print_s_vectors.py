#!/usr/bin/env python
"""Print all 2^(d-1) sign vectors (test_s_vectors.f90 parity)."""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from ttcross_tpu.apps import s_vectors
from ttcross_tpu.utils import readarg


def main():
    d = readarg(1, 4)
    for row in s_vectors(d):
        print(" ".join(f"{int(x):+d}" for x in row))


if __name__ == "__main__":
    main()
