"""REST server entrypoint — the reference's `bright` binary analog:

    python jobs/serve.py --data-dir /data/indexes --port 7700

Serves the reference's index/document/search routes (see
bright_spark/api/server.py) over one SparkSession; every request maps
to the same IndexStore call the library exposes.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--port", type=int, default=7700)
    ap.add_argument("--master", default=None)
    ap.add_argument("--partitions", type=int, default=None)
    args = ap.parse_args()

    from bright_spark.api.server import make_server
    from bright_spark.index.store import IndexStore
    from bright_spark.session import get_spark
    from bright_spark.streaming.manager import IngressManager

    spark = get_spark("serve", master=args.master,
                      shuffle_partitions=args.partitions)
    store = IndexStore(spark, args.data_dir)
    manager = IngressManager(spark, args.data_dir)
    srv = make_server(store, args.port, ingress_manager=manager)
    print(f"serving on http://127.0.0.1:{srv.server_address[1]} "
          f"(data: {args.data_dir})", flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.shutdown()
        spark.stop()


if __name__ == "__main__":
    main()
