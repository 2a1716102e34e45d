from pointcloudattack_tpu.cli.main import main

main()
