"""Dataset smoke check — reference scripts/test_data_set.py (C22), fixed to
the current 6-tuple format: iterate a SpecsDataset and report shapes."""

from _common import base_parser


def main():
    p = base_parser(__doc__)
    p.add_argument("dir", help="SpecsDataset directory")
    args = p.parse_args()

    import sys

    from acoustic_locating_vq_vae_tpu.data import SpecsDataset

    ds = SpecsDataset(args.dir)
    print(f"{len(ds)} samples; fs={ds.fs} NFFT={ds.NFFT} hop={ds.HOP_LENGTH}")
    for i in range(len(ds)):
        speech, rir, echoed, fs, theta, wiener = ds[i]
        if i < 5 or i == len(ds) - 1:
            print(
                f"  [{i}] speech {speech.shape} rir {rir.shape} echoed {echoed.shape} "
                f"theta {float(theta.reshape(-1)[0]):+.3f} wiener {wiener.shape}"
            )
    print("ok")


if __name__ == "__main__":
    main()
