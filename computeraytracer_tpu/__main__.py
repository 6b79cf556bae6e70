import sys

from computeraytracer_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
