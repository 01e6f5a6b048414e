from openpystruct_tpu.cli import main

main()
