from codemix_dense_retrieval_tpu.cli import main

main()
