from spgrid.bench.cli import main
import sys

sys.exit(main())
