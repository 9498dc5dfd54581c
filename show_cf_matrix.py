"""Pretty-print the 10x10 CF difficulty matrix produced by
``make_mnist_cf_matrix.py`` (successor of ``show_cf_matrix.py:16-51``)."""
from argparse import ArgumentParser
import pickle

parser = ArgumentParser()
parser.add_argument("--matrix", type=str, default="mnist-cf-matrix.pkl")
parser.add_argument("--metric", type=str, default=None,
                    help="metric the matrix was built with (sanity check; "
                         "the pkl stores one matrix per build)")

if __name__ == "__main__":
    args = parser.parse_args()
    import numpy as np

    with open(args.matrix, "rb") as f:
        data = pickle.load(f)
    matrix = data["matrix"] if isinstance(data, dict) else data
    if args.metric and isinstance(data, dict):
        built = data.get("metric", "mixture")
        if built != args.metric:
            raise SystemExit(
                f"{args.matrix} was built with metric={built!r}; rebuild with "
                f"make_mnist_cf_matrix.py --metric {args.metric}"
            )

    header = "src\\tgt " + " ".join(f"{t:>6d}" for t in range(10))
    print(header)
    print("-" * len(header))
    for src in range(10):
        cells = []
        for tgt in range(10):
            v = matrix[src, tgt]
            cells.append("     -" if np.isnan(v) else f"{v:6.3f}")
        print(f"{src:>7d} " + " ".join(cells))
    print("\n(minimal class-mixture weight that flips the classifier; lower = easier)")
