from gemma_tpu.cli import main

main()
