// External-variable + modifier fixture rules (reference compiles these
// globals into every rule set: src/main.rs:857-871; set per row at
// src/modules/filesystem_scan.rs:1017-1032).

rule ExtVar_Exe_Netcat {
    meta:
        score = 55
        description = "netcat indicator inside an .exe-tool turn"
        author = "demo"
    strings:
        $nc = "netcat"
    condition:
        $nc and extension == "exe"
}

rule ExtVar_Mimikatz_Name {
    meta:
        score = 45
        description = "mimikatz tool name outside user turns"
    condition:
        filename contains "mimikatz" and owner != "user"
}

rule ExtVar_OfSet_Indicators {
    meta:
        score = 42
        description = "any net indicator inside assistant turns (of-set)"
    strings:
        $ind1 = "netcat"
        $ind2 = "meterpreter"
        $zzz = "never-present-marker"
    condition:
        1 of ($ind*) and owner == "assistant"
}

rule Fullword_Probe {
    meta:
        score = 50
        description = "fullword boundary probe"
    strings:
        $fw = "fwprobe" fullword
    condition:
        any of them
}
