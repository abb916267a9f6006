#!/usr/bin/env python
"""Plot the TT-cross pdf curve, optionally against TT-SVD data.

Maps plot-ttcross-data.py:1-19 and plot-ttcross-and-ttsvd-data.py:1-29:
reads out/tt-cross-pdf.txt (x, pdf) pairs, saves a PNG, and if a TT-SVD
comparison file is given also prints the mean absolute error."""

import sys

import numpy as np

__all__ = ["plot_pdf"]


def plot_pdf(path: str = "out/tt-cross-pdf.txt", out: str = "out/tt-cross-pdf.png",
             svd_path: str | None = None) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    data = np.loadtxt(path)
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(data[:, 0], data[:, 1], label="TT-cross")
    if svd_path:
        svd = np.loadtxt(svd_path)
        ax.plot(svd[:, 0], svd[:, 1], "--", label="TT-SVD")
        m = min(len(svd), len(data))
        print("mean abs error:", np.abs(data[:m, 1] - svd[:m, 1]).mean())
    ax.set_xlabel("basket value")
    ax.set_ylabel("density")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out, dpi=120)


if __name__ == "__main__":
    plot_pdf(*(sys.argv[1:] or []))
