"""spark-submit entrypoint for the kgpipe pipeline.

A module file using relative imports cannot be spark-submit's top-level
script; point spark-submit at THIS file and ship the package alongside:

    python -m zipfile -c kgpipe.zip kgpipe
    spark-submit --py-files kgpipe.zip --master <cluster> \
        tools/spark_submit_entry.py \
        --transcripts <table-or-path> --obo CL=cl.obo \
        --out /data/triples --lineage /data/lineage --fused
"""

from kgpipe.pipeline import main

if __name__ == "__main__":
    main()
