# minimal pure-perl pairwise() shim so the reference's minimath generator
# runs in this container (List::MoreUtils is not installed)
package List::MoreUtils;
use strict; use warnings;
use Exporter 'import';
our @EXPORT_OK = qw(pairwise);
sub pairwise (&\@\@) {
    my ($code, $A, $B) = @_;
    my @out;
    no strict 'refs';
    my $caller = caller;
    for my $i (0 .. $#$A) {
        local *{"${caller}::a"} = \$A->[$i];
        local *{"${caller}::b"} = \$B->[$i];
        push @out, $code->();
    }
    return @out;
}
1;
