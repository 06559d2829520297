SELECT COUNT(*) FROM users as u, badges as b, comments as c WHERE b.UserId = u.Id AND c.UserId = u.Id AND u.DownVotes=10 AND u.CreationDate>='2011-08-21 17:46:14'::timestamp AND c.Score>=10;
