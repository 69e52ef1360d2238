"""One-direction s2t GAN training (reference main_gan.py / train_gan.py).

Thin wrapper: same engine as cli.main with the cycle path disabled.
"""

from __future__ import annotations

from .main import gan_main
from .options import train_parse
from ..utils.preempt import GracefulShutdown


def main(argv=None):
    args = train_parse().parse_args(argv)
    args.cycle = False
    with GracefulShutdown() as shutdown:
        gan_main(args, shutdown=shutdown)


if __name__ == "__main__":
    main()
