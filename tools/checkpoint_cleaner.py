"""Strip optimizer state from a train-state checkpoint (deploy size).

Counterpart of the reference tools/checkpoint_cleaner.py:10-16.

  python tools/checkpoint_cleaner.py in.msgpack out.msgpack
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('src')
    p.add_argument('dst')
    args = p.parse_args()

    import flax.serialization
    with open(args.src, 'rb') as f:
        state = flax.serialization.msgpack_restore(f.read())
    kept = {k: v for k, v in state.items()
            if k not in ('opt_state',)}
    with open(args.dst, 'wb') as f:
        f.write(flax.serialization.msgpack_serialize(kept))
    print(f'{args.src} ({os.path.getsize(args.src)} B) -> '
          f'{args.dst} ({os.path.getsize(args.dst)} B), '
          f'kept: {sorted(kept)}')


if __name__ == '__main__':
    main()
