SELECT COUNT(*) FROM users as u, badges as b, comments as c WHERE b.UserId = u.Id AND c.UserId = u.Id AND u.Views>=25 AND u.UpVotes>=242 AND c.CreationDate>='2014-06-05 22:15:22'::timestamp;
