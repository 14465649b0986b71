rule EICAR_Test_Payload {
    meta:
        score = 80
        description = "EICAR-style test payload marker"
        author = "demo"
        reference = "https://example.com/eicar"
    strings:
        $a = "EICAR-TEST-PAYLOAD"
    condition:
        any of them
}

rule Netcat_Shell {
    meta:
        score = 75
        description = "netcat reverse shell indicator"
    strings:
        $a = "netcat"
        $b = "-e /bin/sh"
    condition:
        all of them
}

rule Meterpreter_Indicator {
    meta:
        description = "meterpreter payload stage marker"
    strings:
        $a = "meterpreter"
    condition:
        any of them
}
