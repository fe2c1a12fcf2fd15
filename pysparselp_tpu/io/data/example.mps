* simple example of MPS file from http://lpsolve.sourceforge.net/5.5/mps-format.htm
* For comparison, here is the same model written out in lp-format:
*
* min: +XONE +4 YTWO +9 ZTHREE;
* LIM1: +XONE +YTWO <= 5;
* LIM2: +XONE +ZTHREE >= 10;
* MYEQN: -YTWO +ZTHREE = 7;
* XONE <= 4;
* YTWO >= -1;
* YTWO <= 1;

NAME          TESTPROB
ROWS
 N  COST
 L  LIM1
 G  LIM2
 E  MYEQN
COLUMNS
    XONE      COST                 1   LIM1                 1
    XONE      LIM2                 1
    YTWO      COST                 4   LIM1                 1
    YTWO      MYEQN               -1
    ZTHREE    COST                 9   LIM2                 1
    ZTHREE    MYEQN                1
RHS
    RHS1      LIM1                 5   LIM2                10
    RHS1      MYEQN                7
BOUNDS
 UP BND1      XONE                 4
 LO BND1      YTWO                -1
 UP BND1      YTWO                 1
ENDATA
